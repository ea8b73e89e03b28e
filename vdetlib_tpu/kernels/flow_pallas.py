"""Pallas TPU kernel for the block-matching flow level.

Reference parity: same math as kernels/flow.py::_flow_level (the
``cv2.calcOpticalFlowFarneback`` stand-in whose acceptance criterion is MGP
box-shift tolerance — SURVEY.md §3.3/§7). The XLA formulation is HBM-bound:
each of the S² shift iterations materializes several (P, H, W) temporaries,
streaming tens of GB per snippet. Here one grid step owns G pairs and runs
the ENTIRE online soft-argmin loop in VMEM; HBM traffic collapses to
reading the S dx-shifted image copies once and writing the flow field.

Layout notes (Mosaic):
- lane-dimension dynamic slices must be 128-aligned, so the dx (horizontal)
  shifts are precomputed in XLA as S edge-clamped copies; dy (vertical)
  shifts become sublane-dim dynamic slices of a vertically padded buffer,
  which are unrestricted.
- the (2r+1)² box filter is two banded-matrix matmuls (MXU) instead of
  reduce_window: band[H+2p, H] / band[W, W] with ones on |i-j+off| ≤ r —
  zero padding semantics exactly like the XLA reduce_window("SAME").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_V = 8  # vertical edge padding (≥ search); sublane slice offset base


def _band(n_in: int, n_out: int, radius: int, offset: int = 0) -> np.ndarray:
    """Banded ones matrix: out[j] = Σ_i in[i] for |i - (j + offset)| ≤ r."""
    i = np.arange(n_in)[:, None]
    j = np.arange(n_out)[None, :]
    return (np.abs(i - (j + offset)) <= radius).astype(np.float32)


def _flow_kernel(
    i1_ref, i2s_ref, bandh_ref, fx_ref, fy_ref,
    *, search, radius, temperature, inv_k2,
):
    """One grid step: G pairs' full online soft-argmin over S² shifts.

    i1_ref: (G, H, W) bf16; i2s_ref: (G, S, H+2·PAD_V, W) bf16 dx-shifted
    edge-clamped copies; bandh_ref: (W, W) f32 banded ones (the horizontal
    box window as one MXU matmul). The vertical box window is 2r+1 static
    sublane shift-adds of a zero-padded buffer — sublane slices have no
    alignment restriction, lane slices do (hence the precomputed dx copies).
    """
    G, H, W = i1_ref.shape
    S = 2 * search + 1
    i1 = i1_ref[:]  # bf16 — the fast preset's cost volume runs bf16-in
    bandh = bandh_ref[:]

    def body(dx_i, carry):
        # dynamic index only on the untiled leading copy axis (unrestricted);
        # dy offsets below are STATIC sublane slices of the loaded value —
        # dynamic sublane offsets must be 8-aligned, which ±search is not.
        block = i2s_ref[:, dx_i]  # (G, H + 2·PAD_V, W) bf16
        dx_f = (dx_i - search).astype(jnp.float32)
        m, den, fx, fy = carry
        for dy in range(-search, search + 1):
            shifted = block[:, PAD_V + dy : PAD_V + dy + H, :]
            diff = i1 - shifted
            sq = diff * diff  # (G, H, W) bf16
            # horizontal window: banded matmul (MXU, zero-pad semantics)
            sx = jax.lax.dot_general(
                sq, bandh, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G, H, W)
            # vertical window: zero-pad + static sublane shift-adds
            sp = jnp.pad(sx, ((0, 0), (radius, radius), (0, 0)))
            c = sp[:, 0:H, :]
            for o in range(1, 2 * radius + 1):
                c = c + sp[:, o : o + H, :]
            c = c * inv_k2
            m_new = jnp.minimum(m, c)
            rescale = jnp.exp(-temperature * (m - m_new))
            w = jnp.exp(-temperature * (c - m_new))
            den = den * rescale + w
            fx = fx * rescale + w * dx_f
            fy = fy * rescale + w * jnp.float32(dy)
            m = m_new
        return m, den, fx, fy

    init = (
        jnp.full((G, H, W), jnp.inf, jnp.float32),
        jnp.zeros((G, H, W), jnp.float32),
        jnp.zeros((G, H, W), jnp.float32),
        jnp.zeros((G, H, W), jnp.float32),
    )
    _, den, fx, fy = jax.lax.fori_loop(0, S, body, init)
    fx_ref[:] = fx / den
    fy_ref[:] = fy / den


@functools.partial(
    jax.jit,
    static_argnames=("search", "radius", "temperature", "interpret"),
)
def flow_level_pallas(
    i1,
    i2,
    search: int = 5,
    radius: int = 3,
    temperature: float = 0.08,
    interpret: bool = False,
):
    """Batched single-level block-matching flow, Pallas TPU kernel.

    Args:
      i1, i2: (P, H, W) grayscale (any float dtype; cost runs bf16-in,
        f32-accumulate).
    Returns:
      (P, H, W, 2) flow (dx, dy) — same online soft-argmin semantics as
      kernels/flow.py::_flow_level (box-shift tolerance, not bitwise).
    """
    P, H, W = i1.shape
    S = 2 * search + 1
    G = 4  # pairs per grid step
    Pp = ((P + G - 1) // G) * G

    i1b = jnp.pad(i1, ((0, Pp - P), (0, 0), (0, 0))).astype(jnp.bfloat16)
    # vertical edge pad to PAD_V, then S horizontal edge-clamped dx copies
    i2v = jnp.pad(
        i2, ((0, Pp - P), (PAD_V, PAD_V), (0, 0)), mode="edge"
    ).astype(jnp.bfloat16)
    xs = jnp.arange(W)
    shifts = [
        i2v[:, :, jnp.clip(xs + dx, 0, W - 1)] for dx in range(-search, search + 1)
    ]
    i2s = jnp.stack(shifts, axis=1)  # (Pp, S, H+2PAD_V, W)

    bandh = _band(W, W, radius).astype(np.float32).astype(jnp.bfloat16)

    kernel = functools.partial(
        _flow_kernel,
        search=search,
        radius=radius,
        temperature=float(temperature),
        inv_k2=1.0 / float((2 * radius + 1) ** 2),
    )
    spec_i1 = pl.BlockSpec((G, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_i2 = pl.BlockSpec(
        (G, S, H + 2 * PAD_V, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    spec_bandh = pl.BlockSpec(
        bandh.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    spec_out = pl.BlockSpec((G, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    fx, fy = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Pp, H, W), jnp.float32),
            jax.ShapeDtypeStruct((Pp, H, W), jnp.float32),
        ),
        grid=(Pp // G,),
        in_specs=[spec_i1, spec_i2, spec_bandh],
        out_specs=(spec_out, spec_out),
        interpret=interpret,
    )(i1b, i2s, jnp.asarray(bandh))
    return jnp.stack([fx[:P], fy[:P]], axis=-1)
