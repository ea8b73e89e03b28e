"""v2 vs v3 (2D-flattened adjacency) Pallas NMS fixpoint, on chip.

The ROADMAP probe: round 2 measured the (R, 128, 128) broadcast-built
adjacency as materialization-bound (~4× off the naive VPU estimate);
_fixpoint2d_kernel rebuilds it as (R·128, 128) with every plane in native
(sublane, lane) layout (lowering primitives verified by
scripts/probe_adj_lowering.py). This script:

  1. hw-vs-interpret parity for the v3 variant at the production shapes,
  2. marginal chain-differenced cost (CLAUDE.md methodology) of v2 vs v3 at
     the bench NMS shape (256 frames × 30 classes × 64 boxes), interleaved
     A/B passes to defeat cross-window chip noise.

Run ON THE CHIP: python scripts/probe_adj2d.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.kernels.nms_pallas import nms_pallas_fixpoint

T, CLS, N = 256, 30, 64
CHAIN_LO, CHAIN_HI = 8, 64
REPS = 3


def _boxes(rng, prefix):
    x1 = rng.uniform(0, 300, prefix)
    y1 = rng.uniform(0, 200, prefix)
    w = rng.uniform(8, 120, prefix)
    h = rng.uniform(8, 120, prefix)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)


def parity():
    rng = np.random.default_rng(0)
    for b, n in [(4, 8), (16, 48), (64, 128), (512, 64)]:
        boxes = jnp.asarray(_boxes(rng, (b, n)))
        scores = jnp.asarray(
            np.round(rng.uniform(0, 1, (b, n)) * 20).astype(np.float32) / 20
        )
        valid = jnp.asarray(rng.uniform(size=(b, n)) > 0.2)
        hw = np.asarray(
            nms_pallas_fixpoint(boxes, scores, valid, 0.3, variant="adj2d")
        )
        it = np.asarray(
            nms_pallas_fixpoint(
                boxes, scores, valid, 0.3, interpret=True, variant="adj2d"
            )
        )
        ok = np.array_equal(hw, it)
        print(f"adj2d hw-vs-interpret ({b},{n}): {'OK' if ok else 'MISMATCH'}")
        assert ok, (b, n)


def bench():
    rng = np.random.default_rng(0)
    boxes = jnp.asarray(_boxes(rng, (T * CLS, N)))
    scores = jnp.asarray(rng.uniform(0.01, 1, (T * CLS, N)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(T * CLS, N)) > 0.5)

    def make(variant, chain):
        def run():
            def body(c, _):
                keep = nms_pallas_fixpoint(
                    boxes, scores + c * 1e-9, valid, 0.3, variant=variant
                )
                return c + 1.0, keep.sum()

            _, sums = jax.lax.scan(body, 0.0, None, length=chain)
            return sums.sum()

        return jax.jit(run)

    fns = {
        (v, c): make(v, c)
        for v in ("v2", "adj2d")
        for c in (CHAIN_LO, CHAIN_HI)
    }
    for f in fns.values():
        float(f())  # compile + warm
    best = {k: float("inf") for k in fns}
    for _ in range(REPS):  # interleave variants within each pass
        for k, f in fns.items():
            t0 = time.perf_counter()
            float(f())
            best[k] = min(best[k], time.perf_counter() - t0)
    total_boxes = T * CLS * N
    for v in ("v2", "adj2d"):
        per_call = (best[(v, CHAIN_HI)] - best[(v, CHAIN_LO)]) / (
            CHAIN_HI - CHAIN_LO
        )
        print(
            json.dumps(
                {
                    "variant": v,
                    "ms_per_call": round(per_call * 1e3, 3),
                    "Mboxes_per_sec": round(total_boxes / per_call / 1e6, 1),
                }
            )
        )


if __name__ == "__main__":
    parity()
    bench()
