#!/usr/bin/env python
"""Run any vdetlib_tpu CLI tool pinned to the local CPU backend.

The axon terminal's sitecustomize forces jax_platforms="axon,cpu" at
interpreter boot (ignoring the JAX_PLATFORMS env var — CLAUDE.md gotcha 5),
so `python -m vdetlib_tpu train_detector ...` would run on the single remote
TPU and contend with any on-chip benchmark (gotcha 3: one TPU process at a
time). This wrapper overrides the platform at jax-config level BEFORE any
backend initializes, then dispatches to the normal CLI entry point:

    python scripts/cpu_cli.py train_detector /tmp/ck_hard --model small ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cpu_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from vdetlib_tpu.cli import dispatch  # noqa: E402

if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(dispatch(sys.argv[1], sys.argv[2:]) or 0)
