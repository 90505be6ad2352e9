"""Pallas kernels (interpret mode on CPU) vs XLA oracle; matmul crop vs
gather crop."""

import jax
import jax.numpy as jnp
import numpy as np

from rdpn6d_tpu.ops.pallas_kernels import min_dist2_pallas, min_dist2_xla
from rdpn6d_tpu.ops.warp import crop_resize, crop_resize_mm


def test_min_dist_pallas_matches_xla():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(300, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(700, 3).astype(np.float32))
    ours = min_dist2_pallas(a, b, interpret=True)
    ref = min_dist2_xla(a, b)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_min_dist_pallas_padding_safe():
    # sizes far from tile multiples; padded b rows must never win
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(7, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(5, 3).astype(np.float32) * 0.1)
    ours = min_dist2_pallas(a, b, interpret=True)
    ref = min_dist2_xla(a, b)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_crop_resize_mm_matches_gather():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(120, 160, 3).astype(np.float32))
    center = jnp.array([80.0, 60.0])
    out_g = crop_resize(img, center, 96.0, 32, "bilinear")
    out_m = crop_resize_mm(img, center, 96.0, 32)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_g),
                               atol=1e-5)


def test_crop_resize_mm_out_of_bounds_zero():
    img = jnp.ones((32, 32))
    out = crop_resize_mm(img, jnp.array([0.0, 0.0]), 32.0, 32)
    o = np.asarray(out)
    assert o[0, 0] == 0.0
    assert abs(o[-1, -1] - 1.0) < 1e-6
