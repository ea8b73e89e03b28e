"""Interleaved A/B of track_batch across repo history (r3 / r4 / HEAD).

Built to adjudicate the round-5 component-profile anomaly: the A=8 tracker
round measured 47.9 ms where the r3 table recorded 19.8 ms, while every
other component row matched history — code regression or chip weather?
All variants are extracted from git, compiled up front, and measured
interleaved in ONE process (chain-differenced, chains 2 vs 8), so tunnel
weather hits all alike. First run answered: r3 20.9 / r4 20.9 / HEAD 49.3
ms — a REAL r5 regression (the EMA refactor threaded the frozen template
stack through the scan body; see track_batch's else-branch comment), fixed
the same session (HEAD back to ~21 ms, re-measured).

Run on the chip from the repo root:
    python scripts/ab_track_versions.py [gitref ...]
(defaults: 6f78bbe 05c729c HEAD)
"""
import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

import bench as B
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.video.track import init_tracker, tracker_features


def load_version(ref: str, tmpdir: str):
    if ref == "HEAD":
        import vdetlib_tpu.video.track as m
        return m
    src = subprocess.check_output(
        ["git", "show", f"{ref}:vdetlib_tpu/video/track.py"], text=True
    )
    path = os.path.join(tmpdir, f"track_{ref[:7]}.py")
    with open(path, "w") as f:
        f.write(src)
    name = f"track_{ref[:7]}"
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m  # dataclass machinery resolves cls.__module__
    spec.loader.exec_module(m)
    return m


def main():
    refs = sys.argv[1:] or ["6f78bbe", "05c729c", "HEAD"]
    T, H, W, R, A = B.T, B.H, B.W, B.R, B.A
    frames_np, rois_np = B.build_inputs()
    trk_cfg = TrackerConfig()
    trk_model, trk_p = init_tracker(trk_cfg, image_hw=(H, W), seed=0)
    feats = tracker_features(trk_model, trk_p, jnp.asarray(frames_np[:T]))
    ats = jnp.asarray([10, 50, 90, 130, 170, 210, 240, 250])
    abx = jnp.asarray(rois_np[0, :A])

    def make(fn, ch):
        @jax.jit
        def run():
            def body(c, _):
                out = fn(trk_model, trk_cfg, feats, ats, abx + c * 0, 0.5)
                leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
                s = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)
                return c + 1.0, s
            _, ss = jax.lax.scan(body, 0.0, None, length=ch)
            return ss.sum()
        return run

    with tempfile.TemporaryDirectory() as tmpdir:
        meters = {}
        for ref in refs:
            fn = load_version(ref, tmpdir).track_batch
            lo, hi = make(fn, 2), make(fn, 8)
            float(lo()); float(hi())
            meters[ref] = (lo, hi)
            print(json.dumps({"compiled": ref}), flush=True)

        def t(f):
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                float(f())
                best = min(best, time.perf_counter() - t0)
            return best

        for rnd in range(3):
            row = {"round": rnd}
            for ref, (lo, hi) in meters.items():
                row[ref + "_ms"] = round((t(hi) - t(lo)) / 6 * 1e3, 2)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
