"""Fused resize+normalize kernel tests (XLA + Pallas interpret parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vdetlib_tpu.kernels.preprocess import (
    _resize_matrix,
    fused_resize_normalize,
    fused_resize_normalize_pallas,
)


def test_resize_matrix_rows_sum_to_one():
    for src, dst in [(240, 120), (100, 240), (64, 64)]:
        m = _resize_matrix(src, dst)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, rtol=1e-6)


def test_identity_resize_is_identity():
    m = _resize_matrix(16, 16)
    np.testing.assert_allclose(m, np.eye(16), atol=1e-6)


def test_upscale_matches_jax_image_resize(rng):
    # on UPscaling jax.image bilinear == 2-tap bilinear (no anti-alias kernel)
    frames = rng.integers(0, 255, (2, 24, 32, 3), dtype=np.uint8)
    out = np.asarray(
        fused_resize_normalize(jnp.asarray(frames), (48, 64), pixel_mean=(0, 0, 0))
    )
    import jax

    want = np.asarray(
        jax.image.resize(frames.astype(np.float32), (2, 48, 64, 3), method="bilinear")
    )
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-3)


def test_downscale_matches_cv2_linear(rng):
    # on DOWNscaling the 2-tap matrix matches cv2 INTER_LINEAR semantics
    # (jax.image.resize anti-aliases instead)
    import cv2

    frame = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    out = np.asarray(
        fused_resize_normalize(jnp.asarray(frame[None]), (24, 32), pixel_mean=(0, 0, 0))
    )[0]
    want = cv2.resize(
        frame.astype(np.float32), (32, 24), interpolation=cv2.INTER_LINEAR
    )
    np.testing.assert_allclose(out, want, rtol=1e-3, atol=0.35)


def test_mean_subtract_and_scale(rng):
    frames = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    mean = (10.0, 20.0, 30.0)
    out = np.asarray(
        fused_resize_normalize(jnp.asarray(frames), (32, 32), pixel_mean=mean, pixel_scale=0.5)
    )
    want = (frames.astype(np.float32) - np.asarray(mean)) * 0.5
    np.testing.assert_allclose(out, want, atol=1e-3)


def test_pallas_matches_xla(rng):
    frames = rng.integers(0, 255, (3, 40, 56, 3), dtype=np.uint8)
    a = np.asarray(
        fused_resize_normalize(jnp.asarray(frames), (24, 32))
    )
    b = np.asarray(
        fused_resize_normalize_pallas(jnp.asarray(frames), (24, 32), interpret=True)
    )
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)
