"""ON-CHIP test harness (opt-in — NOT collected by `pytest tests/`).

Unlike tests/conftest.py this does NOT force the CPU platform: these tests
exist precisely to run each Pallas kernel on real TPU hardware and compare
against interpret mode, institutionalizing the CLAUDE.md rule "always run an
hw-vs-interpret check on a new kernel" (degenerate shapes have MISCOMPILED
silently before — see the Mosaic lowering notes). Run with:

    python -m pytest tests_tpu/ -q     # on a host with the TPU attached

Every test skips itself on non-TPU backends, so the command is safe
anywhere. ONE TPU process at a time (CLAUDE.md gotcha #3) — do not run
this concurrently with bench/pipeline jobs.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import pytest


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip(
            f"hw-parity suite needs a TPU backend "
            f"(got {jax.default_backend()})",
            allow_module_level=False,
        )
