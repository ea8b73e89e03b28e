"""Probe: tracker fwd+bwd scan unroll factor.

The 2A-folded scan is step-overhead-bound (~77µs/step for ~µs of FLOPs).
Round 2 measured scan unroll=4/8 COMPILES running >40 min (abandoned);
unroll=2 was never tried. Chain-differenced marginal at the bench shape,
with a wall-clock guard on each compile.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.video.track import init_tracker, track_batch, tracker_features

T, H, W, A = B.T, B.H, B.W, B.A
CHAINS = (2, 8)


def main():
    trk_cfg = TrackerConfig()
    trk_model, trk_p = init_tracker(trk_cfg, image_hw=(H, W), seed=0)
    frames_np, _ = B.build_inputs()
    frames = jnp.asarray(frames_np)
    feats = tracker_features(trk_model, trk_p, frames[:T])
    rng = np.random.default_rng(0)
    ats = jnp.asarray(rng.integers(0, T, A).astype(np.int32))
    abx = jnp.asarray(
        np.stack(
            [rng.uniform(0, W - 60, A), rng.uniform(0, H - 60, A),
             rng.uniform(60, W, A), rng.uniform(60, H, A)], axis=1
        ).astype(np.float32)
    )

    def make(ch, unroll):
        @jax.jit
        def run():
            def body(c, _):
                out = track_batch(
                    trk_model, trk_cfg, feats + c * 0, ats, abx, 0.5,
                    unroll=unroll,
                )
                return c + 1.0, sum(
                    jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in out
                )
            _, ss = jax.lax.scan(body, 0.0, None, length=ch)
            return ss.sum()
        return run

    for unroll in (1, 2):
        t0 = time.perf_counter()
        lo, hi = make(CHAINS[0], unroll), make(CHAINS[1], unroll)
        float(lo())
        float(hi())
        compile_s = time.perf_counter() - t0

        def t(f):
            best = 1e9
            for _ in range(3):
                t1 = time.perf_counter()
                float(f())
                best = min(best, time.perf_counter() - t1)
            return best

        marg = (t(hi) - t(lo)) / (CHAINS[1] - CHAINS[0])
        print(
            f"unroll={unroll}: {marg * 1e3:6.2f} ms/round "
            f"(compile+warm {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
