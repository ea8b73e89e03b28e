"""Detection-block efficiency probes (VERDICT r2 item 5) — run on the chip.

Chain-differenced marginal costs (bench_kernels.py methodology) for:
  - the full detection map-loop at B=32 (current production) and B=64
  - backbone-only vs roi_align+head split (attribute the 46.8 ms)
  - stem conv as-is vs an exact space-to-depth rewrite (7x7/s2 on 3ch is
    the classic MXU-starved conv: contraction K = 7*7*3 = 147 on a
    128-lane pad; s2d turns it into 4x4/s1 on 12ch, K = 192 across
    8x fewer windows with full windows on the MXU)
  - GroupNorm stack standalone (the inter-conv HBM traffic suspect)
  - preprocess in f32 (current) vs bf16 materialization

Each variant is parity-checked against its oracle before timing.
"""
import time, json
import numpy as np, jax, jax.numpy as jnp
import bench as B
from flax import linen as nn
from vdetlib_tpu.nn.detector import init_detector, preprocess_images
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.heads import roi_align
from vdetlib_tpu.video.detect import _detect_step

T, H, W, R = B.T, B.H, B.W, B.R
frames_np, rois_np = B.build_inputs()
det_cfg = detector_preset("base", num_classes=31)
det_model, det_p = init_detector(det_cfg, (H, W), max_rois=R, seed=0)
frames = jnp.asarray(frames_np)
rois = jnp.asarray(rois_np)


def timeit(name, fn_builder, chains=(2, 8)):
    def make(ch):
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
    lo, hi = make(chains[0]), make(chains[1])
    float(lo()); float(hi())
    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(f()); best = min(best, time.perf_counter() - t0)
        return best
    marg = (t(hi) - t(lo)) / (chains[1] - chains[0])
    print(json.dumps({"component": name, "marginal_ms": round(marg * 1e3, 2)}), flush=True)
    return marg


def det_fn_at(Bb):
    def fn(c):
        fr_b = frames.reshape(T // Bb, Bb, H, W, 3)
        rs_b = (rois + c * 0).reshape(T // Bb, Bb, R, 4)
        return jax.lax.map(
            lambda ab: _detect_step(det_model, det_p, ab[0], ab[1], True), (fr_b, rs_b)
        )
    return fn


# ---- split: backbone vs roi+head (B=32) ----
Bb = 32
imgs32 = preprocess_images(frames[:Bb], det_cfg)


def backbone_fn(c):
    fr_b = frames.reshape(T // Bb, Bb, H, W, 3)
    def step(fr):
        imgs = preprocess_images(fr, det_cfg)
        return det_model.apply(det_p, imgs, method="features")
    return jax.lax.map(lambda fr: step(fr + c * 0).astype(jnp.float32).sum(), fr_b)


feats32 = det_model.apply(det_p, imgs32, method="features")


def roihead_fn(c):
    def step(rs):
        pooled = jax.vmap(
            lambda f, b: roi_align(f, b, stride=16, pool=det_cfg.roi_pool)
        )(feats32, rs)
        bound = det_model.bind(det_p)
        s, d = bound.head(pooled)
        return s.sum() + d.sum()
    rs_b = (rois + c * 0).reshape(T // Bb, Bb, R, 4)
    return jax.lax.map(step, rs_b)


# ---- stem variants ----
stem_w = det_p["params"]["backbone"]["Conv_0"]["kernel"]  # (7,7,3,64)


def stem_direct(x_u8, w):
    x = preprocess_images(x_u8, det_cfg).astype(jnp.bfloat16)
    return jax.lax.conv_general_dilated(
        x, w.astype(jnp.bfloat16), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def stem_s2d(x_u8, w):
    """Exact space-to-depth rewrite of the 7x7/s2 SAME stem conv."""
    mean = jnp.asarray(det_cfg.pixel_mean, dtype=jnp.float32)
    x = (x_u8.astype(jnp.float32) - mean).astype(jnp.bfloat16)
    n, h, wdt, cin = x.shape
    # SAME s2 with k=7, even H: pad (2, 3); +1 bottom/right for even s2d size.
    x = jnp.pad(x, ((0, 0), (2, 4), (2, 4), (0, 0)))
    hp, wp = x.shape[1] // 2, x.shape[2] // 2
    x2 = x.reshape(n, hp, 2, wp, 2, cin).transpose(0, 1, 3, 2, 4, 5)
    x2 = x2.reshape(n, hp, wp, 4 * cin)
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (8,8,3,C)
    cout = w.shape[-1]
    w4 = w8.reshape(4, 2, 4, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    w4 = w4.reshape(4, 4, 4 * cin, cout).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        x2, w4, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y[:, : h // 2, : wdt // 2]


# parity check (bf16 → expect near-exact: same products, same order per tap)
ref = np.asarray(stem_direct(frames[:4], stem_w), np.float32)
alt = np.asarray(stem_s2d(frames[:4], stem_w), np.float32)
err = np.max(np.abs(ref - alt) / (np.abs(ref) + 1.0))
print(json.dumps({"check": "stem_s2d_parity", "max_rel_err": float(err)}), flush=True)
assert err < 2e-2, "s2d stem mismatch"


def stem_fn(impl):
    def fn(c):
        fr_b = frames.reshape(T // Bb, Bb, H, W, 3)
        return jax.lax.map(
            lambda fr: impl(fr + c * 0, stem_w).astype(jnp.float32).sum(), fr_b
        )
    return fn


# ---- GroupNorm stack standalone ----
def gn_stack_fn(c):
    import math
    total = 0.0
    for feats, hh, ww, reps in ((128, 60, 80, 5), (256, 30, 40, 5), (512, 15, 20, 5)):
        gn = nn.GroupNorm(num_groups=math.gcd(32, feats), dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(feats)
        x = jax.random.normal(key, (Bb, hh, ww, feats), jnp.bfloat16) + c * 0
        p = gn.init(key, x)
        for _ in range(reps):
            x = gn.apply(p, x)
        total = total + x.astype(jnp.float32).sum()
    return total * (T // Bb)


# ---- preprocess materialization dtype ----
def prep_fn(dtype):
    mean = jnp.asarray(det_cfg.pixel_mean, dtype=jnp.float32)
    def fn(c):
        fr_b = frames.reshape(T // Bb, Bb, H, W, 3)
        return jax.lax.map(
            lambda fr: ((fr + c * 0).astype(jnp.float32) - mean)
            .astype(dtype)
            .astype(jnp.float32)
            .sum(),
            fr_b,
        )
    return fn


if __name__ == "__main__":
    import sys

    probes = [
        ("detect full B=32 (prod)", det_fn_at(32)),
        ("detect full B=64", det_fn_at(64)),
        ("backbone only B=32", backbone_fn),
        ("roi_align+head B=32", roihead_fn),
        ("stem direct 7x7/s2", stem_fn(stem_direct)),
        ("stem s2d 4x4/s1", stem_fn(stem_s2d)),
        ("GroupNorm stack (15 layers)", gn_stack_fn),
        ("preprocess f32 materialize", prep_fn(jnp.float32)),
        ("preprocess bf16 materialize", prep_fn(jnp.bfloat16)),
    ]
    sel = sys.argv[1:]  # substring filters; no args = all probes
    for name, fn in probes:
        if sel and not any(s in name for s in sel):
            continue
        timeit(name, fn)
