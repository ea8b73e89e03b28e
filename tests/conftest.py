"""Test harness config: force an 8-device CPU mesh (SURVEY.md §4).

Tests never touch the real TPU — CPU with forced host devices keeps them
fast, deterministic, and exercises the same sharding code paths the driver
validates via __graft_entry__.dryrun_multichip.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persist compiled executables across pytest runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
# small flow-loop unroll: unrolled XLA compiles dominate CPU suite time
os.environ.setdefault("VDETLIB_TPU_FLOW_UNROLL", "4")

# The axon TPU terminal's sitecustomize forces jax_platforms="axon,cpu" at
# interpreter boot (ignoring the JAX_PLATFORMS env var), which would run the
# whole suite against the single remote TPU with remote AOT compiles. Override
# at the config level BEFORE any backend initializes: tests run on the local
# CPU with 8 forced host devices (SURVEY.md §4 "multi-chip without a cluster").
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synth_video():
    from vdetlib_tpu.data.synth import SynthConfig, make_video

    return make_video(SynthConfig(num_frames=30, seed=0))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def random_boxes(rng, n, width=320.0, height=240.0, min_size=4.0, max_size=120.0):
    """Random well-formed [x1,y1,x2,y2] boxes (shared helper)."""
    x1 = rng.uniform(0, width - min_size, size=n)
    y1 = rng.uniform(0, height - min_size, size=n)
    w = rng.uniform(min_size, max_size, size=n)
    h = rng.uniform(min_size, max_size, size=n)
    x2 = np.minimum(x1 + w, width - 1)
    y2 = np.minimum(y1 + h, height - 1)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)
