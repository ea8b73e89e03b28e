"""Fused frame preprocessing: resize + normalize + BGR mean-subtract.

Reference parity: the OpenCV ``imread``/``resize``/mean-subtract host chain
feeding Caffe (SURVEY.md §2.3 — rebuilt as a fused on-device kernel). Frames
cross PCIe as native-resolution uint8 (4× less transfer than f32); on device
one program resizes to the network's static shape and normalizes.

TPU design: bilinear resize IS a pair of separable matmuls — precompute the
1-D interpolation matrices Wy (H', H) and Wx (W', W) once (host constants) and
contract ``out = Wy @ img @ Wxᵀ`` per channel. The MXU does the resampling and
XLA fuses the uint8→f32 cast and mean subtraction into the same program. A
Pallas variant fuses all of it into one VMEM-resident kernel per frame tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear interpolation matrix (align_corners=False)."""
    scale = src / dst
    pos = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    pos = np.clip(pos, 0.0, src - 1.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, src - 1)
    w_hi = pos - lo
    m = np.zeros((dst, src), dtype=np.float32)
    m[np.arange(dst), lo] += (1.0 - w_hi).astype(np.float32)
    m[np.arange(dst), hi] += w_hi.astype(np.float32)
    return m


@functools.partial(jax.jit, static_argnames=("out_hw", "pixel_mean", "pixel_scale"))
def fused_resize_normalize(
    frames_u8: jax.Array,
    out_hw: tuple,
    pixel_mean: tuple = (102.98, 115.95, 122.77),
    pixel_scale: float = 1.0,
) -> jax.Array:
    """(B, H, W, 3) uint8 → (B, H', W', 3) float32, resized + mean-subtracted.

    The separable contraction runs on the MXU; cast/subtract fuse into it.
    """
    B, H, W, C = frames_u8.shape
    Ho, Wo = out_hw
    wy = jnp.asarray(_resize_matrix(H, Ho))  # (H', H)
    wx = jnp.asarray(_resize_matrix(W, Wo))  # (W', W)
    x = frames_u8.astype(jnp.float32)
    x = jnp.einsum("ph,bhwc->bpwc", wy, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("qw,bpwc->bpqc", wx, x, preferred_element_type=jnp.float32)
    mean = jnp.asarray(pixel_mean, jnp.float32)
    return (x - mean) * pixel_scale


def fused_resize_normalize_pallas(
    frames_u8: jax.Array,
    out_hw: tuple,
    pixel_mean: tuple = (102.98, 115.95, 122.77),
    pixel_scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Pallas variant: per-frame fused resize+normalize in one VMEM kernel.

    Grid over frames; each program holds one (H, W, 3) frame in VMEM, does
    both 1-D contractions via MXU dots and writes the normalized (H', W', 3)
    tile. Channels ride the lane dimension padded to 128.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = frames_u8.shape
    Ho, Wo = out_hw
    wy = jnp.asarray(_resize_matrix(H, Ho))  # (H', H)
    wxt = jnp.asarray(_resize_matrix(W, Wo).T)  # (W, W') — pre-transposed

    def kernel(img_ref, wy_ref, wxt_ref, out_ref):
        # channels are static sublane slices → two clean MXU matmuls each,
        # no in-kernel transposes; the mean is folded in as a constant.
        for c in range(C):
            # Mosaic has no direct uint8→f32 cast; hop through int32
            ch = img_ref[0, c].astype(jnp.int32).astype(jnp.float32)  # (H, W)
            rows = jnp.dot(wy_ref[:], ch, preferred_element_type=jnp.float32)
            res = jnp.dot(rows, wxt_ref[:], preferred_element_type=jnp.float32)
            out_ref[0, c] = (res - pixel_mean[c]) * pixel_scale

    planar = jnp.transpose(frames_u8, (0, 3, 1, 2))  # (B, C, H, W)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C, Ho, Wo), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ho, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Wo), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, C, Ho, Wo), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(planar, wy, wxt)
    return jnp.transpose(out, (0, 2, 3, 1))  # back to NHWC
