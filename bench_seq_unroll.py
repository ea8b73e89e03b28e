"""Probe: seq-NMS Viterbi scan unroll factor (VERDICT r2 item 8).

The while_loop's per-iteration Viterbi is a T-step scan of tiny (C, N, N)
bodies — launch-overhead-bound (CLAUDE.md "lax.scan with a small body").
``unroll`` packs k steps per fusion launch; this measures the marginal
seq-NMS cost (chain-differenced, bench_kernels.py methodology) across
unroll factors at the bench shape.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

T, CLS, N = 256, 30, 64
CHAIN_LO, CHAIN_HI = 8, 64
REPS = 3


def main():
    from vdetlib_tpu.kernels.seq_nms import seq_nms_batch

    rng = np.random.default_rng(0)
    x1 = rng.uniform(0, 300, (T, N))
    y1 = rng.uniform(0, 200, (T, N))
    w = rng.uniform(8, 120, (T, N))
    h = rng.uniform(8, 120, (T, N))
    boxes = jnp.asarray(
        np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)
    )
    scores = jnp.asarray(rng.uniform(0.05, 1, (CLS, T, N)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(CLS, T, N)) > 0.6)

    def timed(chain, unroll):
        def fn():
            acc = 0.0
            for c in range(chain):
                out, _pid = seq_nms_batch(
                    boxes, scores + c * 1e-9, mask, 0.5, 0.3,
                    max_paths=32, unroll=unroll,
                )
                acc = acc + jnp.sum(out)
            return acc

        jfn = jax.jit(fn)
        float(jfn())
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(jfn())
            best = min(best, time.perf_counter() - t0)
        return best

    total = CLS * T * N
    for unroll in (4, 8, 16, 32, 64):
        t0c = time.perf_counter()
        t_lo = timed(CHAIN_LO, unroll)
        t_hi = timed(CHAIN_HI, unroll)
        per_call = (t_hi - t_lo) / (CHAIN_HI - CHAIN_LO)
        print(
            f"unroll={unroll:3d}: {per_call * 1e3:7.2f} ms/call, "
            f"{total / per_call / 1e6:6.1f} Mboxes/s "
            f"(wall incl. compile {time.perf_counter() - t0c:.0f}s)"
        )


if __name__ == "__main__":
    main()
