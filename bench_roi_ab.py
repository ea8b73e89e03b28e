"""Interleaved A/B probe: roi_align layouts + head cost, drift-cancelled.

Cross-window chip noise on this terminal exceeds the effects being measured
(RESULTS.md round 3), so every variant here is timed TWICE in one process,
alternating (A B C D E A B C D E); each variant's marginal cost is the min
over its two passes. Chain-differenced like bench_kernels.py.
"""
import time, json
import numpy as np, jax, jax.numpy as jnp
import bench as B
from vdetlib_tpu.nn.detector import init_detector, preprocess_images
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.heads import roi_align

T, H, W, R = B.T, B.H, B.W, B.R
frames_np, rois_np = B.build_inputs()
det_cfg = detector_preset("base", num_classes=31)
det_model, det_p = init_detector(det_cfg, (H, W), max_rois=R, seed=0)
frames = jnp.asarray(frames_np)
rois = jnp.asarray(rois_np)
Bb = 32

imgs32 = preprocess_images(frames[:Bb], det_cfg)
feats32 = det_model.apply(det_p, imgs32, method="features")  # (B, 15, 20, C)
rs_all = rois.reshape(T // Bb, Bb, R, 4)


def make_chain(fn_builder, ch):
    @jax.jit
    def run():
        def body(c, _):
            out = fn_builder(c)
            leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
            s = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)
            return c + 1.0, s
        _, ss = jax.lax.scan(body, 0.0, None, length=ch)
        return ss.sum()
    return run


def roi_fn(fused, compute_dtype=None):
    def fn(c):
        def step(rs):
            return jax.vmap(
                lambda f, b: roi_align(
                    f, b, stride=16, pool=det_cfg.roi_pool,
                    compute_dtype=compute_dtype, fused=fused,
                )
            )(feats32, rs).astype(jnp.float32).sum()
        return jax.lax.map(step, rs_all + c * 0)
    return fn


def head_fn(c):
    pooled = jax.vmap(
        lambda f, b: roi_align(f, b, stride=16, pool=det_cfg.roi_pool)
    )(feats32, rs_all[0])
    bound = det_model.bind(det_p)
    def fn_inner(rs):
        s, d = bound.head(pooled + 0 * rs[0, 0, 0])
        return s.sum() + d.sum()
    return jax.lax.map(fn_inner, rs_all + c * 0)


VARIANTS = [
    ("roi separable f32", roi_fn(False)),
    ("roi fused f32", roi_fn(True)),
    ("roi fused bf16", roi_fn(True, jnp.bfloat16)),
    ("roi separable bf16", roi_fn(False, jnp.bfloat16)),
    ("head only (on fixed pooled)", head_fn),
]
CH = (2, 8)

if __name__ == "__main__":
    chains = {}
    for name, fb in VARIANTS:
        lo, hi = make_chain(fb, CH[0]), make_chain(fb, CH[1])
        float(lo()); float(hi())  # compile
        chains[name] = (lo, hi)
    best = {name: 1e9 for name, _ in VARIANTS}
    for _pass in range(2):
        for name, _ in VARIANTS:
            lo, hi = chains[name]
            for _ in range(3):
                t0 = time.perf_counter(); float(lo()); tlo = time.perf_counter() - t0
                t0 = time.perf_counter(); float(hi()); thi = time.perf_counter() - t0
                best[name] = min(best[name], (thi - tlo) / (CH[1] - CH[0]))
    for name, _ in VARIANTS:
        print(json.dumps({"component": name, "marginal_ms": round(best[name] * 1e3, 2)}), flush=True)
