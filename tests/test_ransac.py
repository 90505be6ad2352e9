"""RANSAC-Kabsch solver: exact recovery, outlier robustness."""

import jax
import jax.numpy as jnp
import numpy as np

from rdpn6d_tpu.ops.ransac_kabsch import kabsch, ransac_kabsch


def _rand_rot(seed):
    rng = np.random.RandomState(seed)
    q, r = np.linalg.qr(rng.randn(3, 3))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def test_kabsch_exact():
    R = _rand_rot(0)
    t = np.array([0.1, -0.2, 0.5], np.float32)
    src = np.random.RandomState(1).randn(50, 3).astype(np.float32) * 0.05
    dst = src @ R.T + t
    R_est, t_est = kabsch(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-6)


def test_kabsch_weighted_ignores_zero_weight():
    R = _rand_rot(2)
    t = np.array([0.0, 0.1, 0.3], np.float32)
    src = np.random.RandomState(3).randn(60, 3).astype(np.float32) * 0.05
    dst = src @ R.T + t
    dst_corrupt = dst.copy()
    dst_corrupt[:10] += 5.0  # gross outliers, weight 0
    w = np.ones(60, np.float32)
    w[:10] = 0.0
    R_est, t_est = kabsch(jnp.asarray(src), jnp.asarray(dst_corrupt),
                          jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-5)


def test_ransac_robust_to_outliers():
    R = _rand_rot(4)
    t = np.array([0.05, 0.0, 0.6], np.float32)
    rng = np.random.RandomState(5)
    src = rng.randn(300, 3).astype(np.float32) * 0.05
    dst = src @ R.T + t
    # 30% outliers
    n_out = 90
    dst[:n_out] += rng.randn(n_out, 3).astype(np.float32) * 0.5
    mask = np.ones(300, np.float32)
    R_est, t_est, ratio = ransac_kabsch(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask),
        jax.random.PRNGKey(0), num_hyps=64, inlier_thr=0.01)
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-3)
    assert float(ratio) > 0.6


def test_ransac_respects_mask():
    R = _rand_rot(6)
    t = np.array([0.0, 0.0, 0.5], np.float32)
    rng = np.random.RandomState(7)
    src = rng.randn(200, 3).astype(np.float32) * 0.05
    dst = src @ R.T + t
    dst[100:] = rng.randn(100, 3) * 10  # garbage, masked out
    mask = np.zeros(200, np.float32)
    mask[:100] = 1.0
    R_est, t_est, _ = ransac_kabsch(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask),
        jax.random.PRNGKey(1), num_hyps=32)
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-3)
