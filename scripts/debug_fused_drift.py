"""Pinpoint the fused-vs-host stream engine divergence.

Hypothesis: the host engine's EAGER per-seed extract_template rounds
differently from the fused program's traced vmap extraction; the 1e-6
template diff amplifies chaotically through the NCC rollout.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.data.synth import SynthConfig, make_video
from vdetlib_tpu.nn.tracker_net import TrackerConfig, extract_template
from vdetlib_tpu.video.track import init_tracker, tracker_features

HW = (96, 128)

trk_cfg = TrackerConfig()
trk_model, trk_params = init_tracker(trk_cfg, image_hw=HW, seed=0)
sv = make_video(SynthConfig(num_frames=8, height=HW[0], width=HW[1], seed=85, max_speed=2.0))
feats = tracker_features(trk_model, trk_params, jnp.asarray(sv.frames))

A = 6
rng = np.random.default_rng(0)
boxes = np.stack([
    np.array([10.0 + 3 * i, 8.0 + 2 * i, 50.0 + 3 * i, 45.0 + 2 * i], np.float32)
    for i in range(A)
])
tis = np.arange(A) % feats.shape[0]

# 1) host style: eager, one at a time
host_tmpl = np.stack([
    np.asarray(extract_template(feats[int(t)], jnp.asarray(b), trk_cfg))
    for t, b in zip(tis, boxes)
])

# 2) fused style: jitted vmap over A lanes
@functools.partial(jax.jit, static_argnames=("cfg",))
def batch_extract(feats_all, tis, boxes, cfg):
    sel = feats_all[jnp.asarray(tis)]
    return jax.vmap(lambda f, b: extract_template(f, b, cfg))(sel, jnp.asarray(boxes))

fused_tmpl = np.asarray(batch_extract(feats, tis, boxes, trk_cfg))
d = np.abs(host_tmpl - fused_tmpl)
print("eager-single vs jit-vmap: maxdiff", d.max(), "nonzero frac", (d > 0).mean())

# 3) jitted single (no vmap) vs eager single
@functools.partial(jax.jit, static_argnames=("cfg",))
def jit_single(f, b, cfg):
    return extract_template(f, b, cfg)

js = np.stack([
    np.asarray(jit_single(feats[int(t)], jnp.asarray(b), trk_cfg))
    for t, b in zip(tis, boxes)
])
d2 = np.abs(host_tmpl - js)
print("eager-single vs jit-single: maxdiff", d2.max(), "nonzero frac", (d2 > 0).mean())

# 4) jit-vmap standalone vs jit-vmap inlined inside a bigger jit w/ barrier
@functools.partial(jax.jit, static_argnames=("cfg",))
def outer(feats_all, tis, boxes, cfg):
    x = jnp.sum(feats_all)  # extra consumer, mimics the fused program context
    sel = feats_all[jnp.asarray(tis)]
    t = jax.lax.optimization_barrier(
        jax.vmap(lambda f, b: extract_template(f, b, cfg))(sel, jnp.asarray(boxes))
    )
    return t, x

inl, _ = outer(feats, tis, boxes, trk_cfg)
d3 = np.abs(np.asarray(inl) - fused_tmpl)
print("jit-vmap standalone vs inlined+barrier: maxdiff", d3.max(), "nonzero frac", (d3 > 0).mean())
