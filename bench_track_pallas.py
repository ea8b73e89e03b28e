"""Hardware harness for the EXPERIMENTAL Pallas tracker-scan kernel: marginal time vs the XLA scan + hw-vs-interpret correctness check (see kernels/track_pallas.py STATUS)."""
import time, json
import numpy as np, jax, jax.numpy as jnp
import bench as B
from vdetlib_tpu.nn.tracker_net import TrackerConfig, extract_template
from vdetlib_tpu.video.track import init_tracker, tracker_features, track_batch
from vdetlib_tpu.kernels.track_pallas import track_scan_pallas

T, H, W, R, A = B.T, B.H, B.W, B.R, B.A
frames_np, rois_np = B.build_inputs()
trk_cfg = TrackerConfig()
trk_model, trk_p = init_tracker(trk_cfg, image_hw=(H, W), seed=0)
feats = tracker_features(trk_model, trk_p, jnp.asarray(frames_np))
anchor_ts = jnp.asarray([10, 50, 90, 130, 170, 210, 240, 250])
anchor_boxes = jnp.asarray(rois_np[0, :A])
templates = jax.vmap(lambda at, ab: extract_template(feats[at], ab, trk_cfg))(
    anchor_ts, anchor_boxes
)


def timeit(name, fn_builder, chains=(1, 3)):
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
            t0 = time.perf_counter(); float(f()); best = min(best, time.perf_counter()-t0)
        return best
    marg = (t(hi) - t(lo)) / (chains[1] - chains[0])
    print(json.dumps({"component": name, "marginal_ms": round(marg*1e3, 2)}), flush=True)


timeit("track_batch (XLA scan unless VDETLIB_TPU_TRACK_PALLAS=1)", lambda c: track_batch(
    trk_model, trk_cfg, feats, anchor_ts, anchor_boxes + c*0, 0.5))

kern = lambda c: track_scan_pallas(
    feats, anchor_ts, anchor_boxes + c*0, templates,
    Q=trk_cfg.search_pool, P=trk_cfg.template_pool,
    factor=trk_cfg.search_factor, stride=4, conf_thresh=0.5)
timeit("track_scan_pallas raw", kern)

# hardware parity vs interpret mode
out_hw = [np.asarray(x) for x in kern(0.0)]
out_it = [np.asarray(x) for x in track_scan_pallas(
    feats, anchor_ts, anchor_boxes, templates,
    Q=trk_cfg.search_pool, P=trk_cfg.template_pool,
    factor=trk_cfg.search_factor, stride=4, conf_thresh=0.5, interpret=True)]
alive_eq = bool((out_hw[2] == out_it[2]).all() and (out_hw[5] == out_it[5]).all())
db = max(float(np.abs(out_hw[0] - out_it[0]).max()),
         float(np.abs(out_hw[3] - out_it[3]).max()))
print(json.dumps({"hw_vs_interpret_alive_equal": alive_eq, "max_box_diff": round(db, 4)}), flush=True)
