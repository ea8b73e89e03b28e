"""Component-level marginal-cost profile of the fused pipeline (TPU).

Times each heavy block of the bench.py workload (detection map-loop, MGP
flow, tracker features, one tracking round) with the dispatch-floor-corrected
chain-differencing meter (see bench_kernels.py). Run on the real chip to
decide the next kernel target; prints one JSON line per component.
"""
import time, json
import numpy as np, jax, jax.numpy as jnp
import bench as B
from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.video.track import init_tracker, tracker_features, track_batch
from vdetlib_tpu.video.detect import _detect_step
from vdetlib_tpu.kernels.flow import flow_video

T, H, W, R, A = B.T, B.H, B.W, B.R, B.A
frames_np, rois_np = B.build_inputs()
det_cfg = detector_preset("base", num_classes=31)
det_model, det_p = init_detector(det_cfg, (H, W), max_rois=R, seed=0)
trk_cfg = TrackerConfig()
trk_model, trk_p = init_tracker(trk_cfg, image_hw=(H, W), seed=0)
frames = jnp.asarray(frames_np); rois = jnp.asarray(rois_np)

def timeit(name, fn_builder):
    def make(ch):
        @jax.jit
        def run():
            def body(c, _):
                out = fn_builder(c)
                leaves = [x for x in jax.tree.leaves(out) if hasattr(x, 'dtype')]
                s = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)
                return c + 1.0, s
            _, ss = jax.lax.scan(body, 0.0, None, length=ch)
            return ss.sum()
        return run
    lo, hi = make(2), make(8)
    float(lo()); float(hi())
    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(f()); best = min(best, time.perf_counter()-t0)
        return best
    marg = (t(hi)-t(lo))/6
    print(json.dumps({"component": name, "marginal_ms": round(marg*1e3, 2)}), flush=True)

Bb = 16
def det_fn(c):
    fr_b = frames.reshape(T//Bb, Bb, H, W, 3)
    rs_b = (rois + c*0).reshape(T//Bb, Bb, R, 4)
    return jax.lax.map(lambda ab: _detect_step(det_model, det_p, ab[0], ab[1], True), (fr_b, rs_b))
timeit("detection(256f, base)", det_fn)

fkw = dict(levels=1, search=4, preset="fast", upsample=False)
def flow_fn(c):
    f = flow_video(frames, **fkw)
    b = jnp.flip(flow_video(jnp.flip(frames + c*0, axis=0), **fkw), axis=0)
    return f, b
timeit("flow fwd+bwd (half-res)", flow_fn)

def feat_fn(c):
    fb = 16
    return jax.lax.map(lambda f: tracker_features(trk_model, trk_p, f), (frames + c*0).reshape(T//fb, fb, H, W, 3))
timeit("tracker features", feat_fn)

feats = tracker_features(trk_model, trk_p, frames[:T])
def track_fn(c):
    ats = jnp.asarray([10, 50, 90, 130, 170, 210, 240, 250])
    abx = jnp.asarray(rois_np[0, :A]) + c*0
    return track_batch(trk_model, trk_cfg, feats, ats, abx, 0.5)
timeit("track_batch 1 round (A=8)", track_fn)
