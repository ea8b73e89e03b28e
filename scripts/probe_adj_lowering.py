"""Mosaic lowering feasibility for the 2D-flattened NMS adjacency build.

The ROADMAP probe ("Pallas NMS adjacency 2D-flattened build, ~2x on a small
block") needs three primitives inside a kernel; this checks which lower on
hardware (CLAUDE.md "Mosaic lowering rules" — test BEFORE building):

  t1: jnp.transpose on a (16, 128) f32 tile (sublane<->lane transpose)
  t2: reshape (2048, 128) -> (128, 16, 128) (SPLIT of the leading dim)
      + reduce over the new leading axis
  t3: pltpu.repeat (16, 128) -> (2048, 128) along sublanes

Run on chip: python scripts/probe_adj_lowering.py
"""

from __future__ import annotations

import functools
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, x, out_shape, want):
    try:
        got = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        ok = np.allclose(np.asarray(got), want)
        print(f"{name}: lowered, values {'OK' if ok else 'WRONG'}")
    except Exception as e:
        print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:160]}")


def main():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (16, 128)).astype(np.float32)
    b = rng.normal(0, 1, (2048, 128)).astype(np.float32)

    def k_t1(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:], (1, 0))

    run("t1 transpose(16,128)", k_t1, jnp.asarray(a), (128, 16), a.T)

    def k_t2(x_ref, o_ref):
        o_ref[:] = jnp.max(x_ref[:].reshape(128, 16, 128), axis=0)

    run(
        "t2 reshape-split+reduce",
        k_t2,
        jnp.asarray(b),
        (16, 128),
        b.reshape(128, 16, 128).max(axis=0),
    )

    def k_t3(x_ref, o_ref):
        o_ref[:] = pltpu.repeat(x_ref[:], 128, axis=0)

    run(
        "t3 pltpu.repeat sublane",
        k_t3,
        jnp.asarray(a),
        (2048, 128),
        np.tile(a, (128, 1)),
    )


if __name__ == "__main__":
    main()
