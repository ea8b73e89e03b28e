"""Kernel micro-benchmarks — NMS + seq-NMS linking boxes/sec (BASELINE.json:2).

Prints one JSON line per kernel. Shapes mirror the full-pipeline benchmark
(bench.py): per-frame per-class NMS over a 256-frame 30-class snippet, and
seq-NMS linking over the same. All timings fence via host scalar fetch
(block_until_ready is async on this terminal). The ~30ms tunnel dispatch
floor is removed by differencing two chain lengths inside one jit:
marginal per-call cost = (t[CHAIN_HI] - t[CHAIN_LO]) / (CHAIN_HI - CHAIN_LO).
(Round-1 numbers divided the floor across CHAIN=8 calls, understating every
kernel by a constant ~3.8ms/call.)
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

T, CLS, N = 256, 30, 64
CHAIN_LO, CHAIN_HI = 8, 64
REPS = 3


def _boxes(rng, shape_prefix):
    x1 = rng.uniform(0, 300, shape_prefix)
    y1 = rng.uniform(0, 200, shape_prefix)
    w = rng.uniform(8, 120, shape_prefix)
    h = rng.uniform(8, 120, shape_prefix)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)


def bench(name, make_fn, total_boxes):
    def timed(chain):
        fn = jax.jit(make_fn(chain))
        float(fn())  # compile + warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(CHAIN_LO), timed(CHAIN_HI)
    per_call = (t_hi - t_lo) / (CHAIN_HI - CHAIN_LO)
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(total_boxes / per_call / 1e6, 2),
                "unit": "Mboxes/sec",
                "ms_per_call": round(per_call * 1e3, 3),
            }
        )
    )


def main():
    from vdetlib_tpu.kernels.nms import batched_nms
    from vdetlib_tpu.kernels.seq_nms import seq_nms_batch

    rng = np.random.default_rng(0)
    boxes = jnp.asarray(_boxes(rng, (T, CLS, N)))
    scores = jnp.asarray(rng.uniform(0.01, 1, (T, CLS, N)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(T, CLS, N)) > 0.5)

    def make_nms(chain):
        def run():
            def body(c, _):
                keep = batched_nms(boxes, scores + c * 1e-9, valid, 0.3)
                return c + 1.0, keep.sum()
            _, sums = jax.lax.scan(body, 0.0, None, length=chain)
            return sums.sum()
        return run

    bench("nms_boxes_per_sec", make_nms, T * CLS * N)

    seq_boxes = jnp.asarray(_boxes(rng, (T, N)))
    seq_scores = jnp.asarray(rng.uniform(0.05, 1, (CLS, T, N)).astype(np.float32))
    seq_mask = jnp.asarray(rng.uniform(size=(CLS, T, N)) > 0.6)

    def make_seq(chain):
        def run():
            def body(c, _):
                out, _pid = seq_nms_batch(
                    seq_boxes, seq_scores + c * 1e-9, seq_mask, 0.5, 0.3,
                    max_paths=32,
                )
                return c + 1.0, out.sum()
            _, sums = jax.lax.scan(body, 0.0, None, length=chain)
            return sums.sum()
        return run

    bench("seq_nms_linking_boxes_per_sec", make_seq, CLS * T * N)


if __name__ == "__main__":
    main()
