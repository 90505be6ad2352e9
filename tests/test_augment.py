"""Color augmentation: op semantics, determinism, bounds."""

import jax
import jax.numpy as jnp
import numpy as np

from rdpn6d_tpu.data.augment import (
    AugOp,
    DEFAULT_AUG,
    color_augment,
)


def test_augment_bounds_and_determinism():
    img = jnp.asarray(np.random.RandomState(0).rand(32, 32, 3) * 255,
                      jnp.float32)
    k = jax.random.PRNGKey(0)
    a1 = color_augment(img, k, DEFAULT_AUG)
    a2 = color_augment(img, k, DEFAULT_AUG)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert float(jnp.min(a1)) >= 0.0 and float(jnp.max(a1)) <= 255.0
    # different keys differ
    a3 = color_augment(img, jax.random.PRNGKey(1), DEFAULT_AUG)
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_add_op_shifts_mean():
    img = jnp.full((16, 16, 3), 100.0)
    op = (AugOp("add", prob=1.0, lo=50.0, hi=50.0),)
    out = color_augment(img, jax.random.PRNGKey(0), op)
    np.testing.assert_allclose(np.asarray(out), 150.0, atol=1e-4)


def test_multiply_op():
    img = jnp.full((16, 16, 3), 100.0)
    op = (AugOp("multiply", prob=1.0, lo=0.5, hi=0.5),)
    out = color_augment(img, jax.random.PRNGKey(0), op)
    np.testing.assert_allclose(np.asarray(out), 50.0, atol=1e-4)


def test_blur_preserves_constant():
    img = jnp.full((16, 16, 3), 77.0)
    op = (AugOp("blur", prob=1.0, lo=1.0, hi=1.0),)
    out = color_augment(img, jax.random.PRNGKey(0), op)
    np.testing.assert_allclose(np.asarray(out), 77.0, atol=1e-3)


def test_prob_zero_is_identity():
    img = jnp.asarray(np.random.RandomState(1).rand(16, 16, 3) * 255,
                      jnp.float32)
    ops = tuple(AugOp(o.kind, prob=0.0, lo=o.lo, hi=o.hi)
                for o in DEFAULT_AUG)
    out = color_augment(img, jax.random.PRNGKey(0), ops)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
