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

def timeit(name, fn_builder, chains=(2, 8)):
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
    lo, hi = make(chains[0]), make(chains[1])
    float(lo()); float(hi())
    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(f()); best = min(best, time.perf_counter()-t0)
        return best
    marg = (t(hi)-t(lo))/(chains[1]-chains[0])
    print(json.dumps({"component": name, "marginal_ms": round(marg*1e3, 2)}), flush=True)

Bb = 32  # bench.py's detection batch (B=32 vs 16 measured -5ms, see RESULTS)
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

# the production default since round 3 (quarter-res Pallas level)
fkw_q = dict(levels=1, search=4, preset="fastest", upsample=False)
def flow_fn_q(c):
    f = flow_video(frames, **fkw_q)
    b = jnp.flip(flow_video(jnp.flip(frames + c*0, axis=0), **fkw_q), axis=0)
    return f, b
timeit("flow fwd+bwd (quarter-res, production)", flow_fn_q)

def feat_fn(c):
    fb = 16
    return jax.lax.map(lambda f: tracker_features(trk_model, trk_p, f), (frames + c*0).reshape(T//fb, fb, H, W, 3))
timeit("tracker features", feat_fn)

# production default since round 5: features only for every 2nd frame
# (track_batch feats_strided contract at track_stride 2)
def feat_fn_s2(c):
    fb = 16
    half = frames[::2]
    return jax.lax.map(lambda f: tracker_features(trk_model, trk_p, f), (half + c*0).reshape(half.shape[0]//fb, fb, H, W, 3))
timeit("tracker features (stride-2 production)", feat_fn_s2)

feats = tracker_features(trk_model, trk_p, frames[:T])
def track_fn(c):
    ats = jnp.asarray([10, 50, 90, 130, 170, 210, 240, 250])
    abx = jnp.asarray(rois_np[0, :A]) + c*0
    return track_batch(trk_model, trk_cfg, feats, ats, abx, 0.5)
timeit("track_batch 1 round (A=8)", track_fn)

def track_fn_s2(c):
    ats = jnp.asarray([10, 50, 90, 130, 170, 210, 240, 250])
    abx = jnp.asarray(rois_np[0, :A]) + c*0
    return track_batch(trk_model, trk_cfg, feats, ats, abx, 0.5, frame_stride=2)
timeit("track_batch 1 round (A=8, stride=2)", track_fn_s2)

# ---- non-NN stage glue (historically the unattributed remainder) ----
from vdetlib_tpu.kernels.nms import nms_grouped
from vdetlib_tpu.kernels.seq_nms import seq_nms_batch
from vdetlib_tpu.pipeline.fused import FusedConfig, _compact_by_rank, _rank_mask
from vdetlib_tpu.video.mgp import _propagate_hop
from vdetlib_tpu.video.rescore import rescore_arrays

C = B.C
cfg = FusedConfig(image_hw=(H, W), anchors_per_round=A, max_tracks=A, max_paths=32)
rng = np.random.default_rng(0)
N0 = cfg.det_budget
M1 = N0 * 3
g_boxes = jnp.asarray(np.concatenate([rois_np[:, :N0]] * 3, axis=1).astype(np.float32))
g_scores = jnp.asarray(rng.uniform(0.0, 1.0, (T, M1)).astype(np.float32))
g_mask = jnp.asarray(rng.uniform(size=(T, M1)) > 0.3)
g_cls = jnp.asarray(rng.integers(1, C, (T, M1)).astype(np.int32))
timeit(
    "nms_grouped dedup (T=256, M1=192)",
    lambda c: nms_grouped(g_boxes, g_scores + c * 1e-9, g_mask, g_cls, cfg.nms_thresh),
)

Nb = cfg.out_budget
oboxes = jnp.asarray(rois_np[:, :Nb].astype(np.float32))
oscores_vec = jnp.asarray(rng.uniform(0.0, 1.0, (T, Nb, C)).astype(np.float32))
omask = jnp.asarray(rng.uniform(size=(T, Nb)) > 0.2)
K = cfg.max_tracks
tb = jnp.asarray(rng.uniform(0, 200, (K, T, 4)).astype(np.float32))
tb = tb.at[..., 2:].set(tb[..., :2] + 30.0)
ta = jnp.asarray(rng.uniform(size=(K, T)) > 0.3)
timeit(
    "rescore_arrays (T=256, Nb=64, K=8)",
    lambda c: rescore_arrays(
        oboxes, oscores_vec + c * 1e-9, omask, tb, ta, cfg.rescore_match,
        cfg.bg_decay, top_ratio=cfg.top_ratio, boost=cfg.boost,
    ),
)

cls_scores = jnp.moveaxis(oscores_vec[:, :, 1:], 2, 0)
cls_mask = (cls_scores > 0.6) & omask[None]
timeit(
    "seq_nms_batch (30cls, 32 paths)",
    lambda c: seq_nms_batch(
        oboxes, cls_scores + c * 1e-9, cls_mask, cfg.link_thresh,
        cfg.suppress_thresh, max_paths=cfg.max_paths, rescore=cfg.link_rescore,
    ),
    chains=(1, 3),
)

M0 = R * (C - 1)
s_flat = jnp.asarray(rng.uniform(0, 1, (T, M0)).astype(np.float32))
b_flat = jnp.asarray(rng.uniform(0, 200, (T, M0, 4)).astype(np.float32))
cls_flat = jnp.asarray(rng.integers(1, C, (T, M0)).astype(np.int32))
m_flat = s_flat >= 0.9

def pack_fn(c):
    kept0, idx0 = _rank_mask(m_flat, N0)
    return _compact_by_rank(idx0, N0, b_flat + c * 0, s_flat, cls_flat, kept0)
timeit("slot packing (M0=1920 -> 64)", pack_fn)

flow_h = jnp.asarray(rng.uniform(-2, 2, (T - 1, H // 2, W // 2, 2)).astype(np.float32))
dmask = jnp.asarray(rng.uniform(size=(T, N0)) > 0.3)
dboxes = jnp.asarray(rois_np[:, :N0].astype(np.float32))

def hop_fn(c):
    hop = jax.vmap(lambda f, b, m: _propagate_hop(f, b, m, 0.5))
    return (
        hop(flow_h + c * 0, dboxes[:-1], dmask[:-1]),
        hop(flow_h, dboxes[1:], dmask[1:]),
    )
timeit("MGP hops fwd+bwd (w=1)", hop_fn)
