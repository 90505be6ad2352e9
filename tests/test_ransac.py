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


def test_kabsch_quat_matches_svd_kabsch():
    """Horn quaternion fit (matrix-squaring eigensolver) must agree with
    the SVD Kabsch on noisy minimal 4-point sets — the RANSAC hypothesis
    regime where it replaces 32k tiny SVDs per eval batch."""
    import numpy as np

    from rdpn6d_tpu.ops.ransac_kabsch import kabsch, kabsch_quat

    rng = np.random.RandomState(0)
    worst_r = worst_t = 0.0
    for _ in range(100):
        A = rng.randn(3, 3)
        U, _, Vt = np.linalg.svd(A)
        R = U @ Vt
        if np.linalg.det(R) < 0:
            R = U @ np.diag([1, 1, -1]) @ Vt
        t = rng.randn(3) * 0.3
        src = rng.randn(4, 3) * 0.05
        dst = (R @ src.T).T + t + rng.randn(4, 3) * 1e-4
        R1, t1 = kabsch(jnp.asarray(src), jnp.asarray(dst))
        R2, t2 = kabsch_quat(jnp.asarray(src), jnp.asarray(dst))
        worst_r = max(worst_r, float(np.abs(np.asarray(R1)
                                            - np.asarray(R2)).max()))
        worst_t = max(worst_t, float(np.abs(np.asarray(t1)
                                            - np.asarray(t2)).max()))
        # always a proper rotation
        R2n = np.asarray(R2, np.float64)
        assert abs(np.linalg.det(R2n) - 1.0) < 1e-4
    assert worst_r < 2e-3 and worst_t < 2e-4, (worst_r, worst_t)
