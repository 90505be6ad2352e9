"""MSSD/MSPD/VSD golden tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from rdpn6d_tpu.evaluation.bop_errors import mspd, mssd, vsd


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def test_mssd_symmetry_aware():
    a = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    pts = np.stack([np.cos(a), np.sin(a), np.zeros_like(a)],
                   -1).astype(np.float32) * 0.05
    # 4-fold symmetric object: syms = rotz(k*pi/2)
    syms = np.stack([_rotz(k * np.pi / 2) for k in range(4)])
    R_gt = np.eye(3, dtype=np.float32)
    R_est = _rotz(np.pi / 2)  # exactly one symmetry step
    t = np.zeros(3, np.float32)
    e = mssd(jnp.asarray(R_est), jnp.asarray(t), jnp.asarray(R_gt),
             jnp.asarray(t), jnp.asarray(pts), jnp.asarray(syms))
    assert float(e) < 1e-6
    # without symmetry: max distance = chord of 90 deg = r*sqrt(2)
    e2 = mssd(jnp.asarray(R_est), jnp.asarray(t), jnp.asarray(R_gt),
              jnp.asarray(t), jnp.asarray(pts),
              jnp.asarray(np.eye(3, dtype=np.float32)[None]))
    np.testing.assert_allclose(float(e2), 0.05 * np.sqrt(2), rtol=1e-4)


def test_mspd_pixels():
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    pts = np.zeros((5, 3), np.float32)
    R = np.eye(3, dtype=np.float32)
    t_gt = np.array([0, 0, 1.0], np.float32)
    t_est = np.array([0.02, 0, 1.0], np.float32)  # 10 px at z=1
    e = mspd(jnp.asarray(R), jnp.asarray(t_est), jnp.asarray(R),
             jnp.asarray(t_gt), jnp.asarray(pts),
             jnp.asarray(np.eye(3, dtype=np.float32)[None]),
             jnp.asarray(K))
    np.testing.assert_allclose(float(e), 10.0, atol=1e-3)


@pytest.fixture(scope="module")
def cube_mesh():
    h = 0.05
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)], np.float32)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = np.array([tri for a, b, c, d in quads
                      for tri in ((a, b, c), (a, c, d))], np.int32)
    return v, faces


def test_vsd_perfect_pose_zero(cube_mesh):
    verts, faces = cube_mesh
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 0.6], np.float32)
    from rdpn6d_tpu.ops.rasterizer import render_mesh
    depth_scene, _ = render_mesh(verts, faces, K, R, t, 480, 640)
    errs = vsd(R, t, R, t, depth_scene, K, verts, faces,
               diameter=0.1 * np.sqrt(3))
    assert errs[0] < 1e-6


def test_vsd_wrong_pose_high(cube_mesh):
    verts, faces = cube_mesh
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float32)
    R = np.eye(3, dtype=np.float32)
    t_gt = np.array([0, 0, 0.6], np.float32)
    t_est = np.array([0.2, 0, 0.6], np.float32)  # far off: no overlap
    from rdpn6d_tpu.ops.rasterizer import render_mesh
    depth_scene, _ = render_mesh(verts, faces, K, R, t_gt, 480, 640)
    errs = vsd(R, t_est, R, t_gt, depth_scene, K, verts, faces,
               diameter=0.1 * np.sqrt(3))
    assert errs[0] > 0.9


def test_mssd_respects_symmetry_translation():
    """BOP symmetries are full 4x4 transforms: a pose equal to the
    symmetry-equivalent (R_gt S_R, R_gt S_t + t_gt) must score ~0 only
    when the translation part is carried (round-2 fix: S_t was dropped)."""
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(64, 3).astype(np.float32) * 0.05)
    R_gt = jnp.eye(3)
    t_gt = jnp.asarray([0.0, 0.0, 0.6])
    S_R = jnp.asarray(np.diag([-1.0, -1.0, 1.0]).astype(np.float32))
    S_t = jnp.asarray([0.02, 0.0, 0.0])   # symmetry center off-origin
    sym_rots = jnp.stack([jnp.eye(3), S_R])
    sym_trans = jnp.stack([jnp.zeros(3), S_t])

    R_est = R_gt @ S_R
    t_est = R_gt @ S_t + t_gt

    from rdpn6d_tpu.evaluation.bop_errors import mssd

    with_t = float(mssd(R_est, t_est, R_gt, t_gt, pts, sym_rots,
                        sym_trans=sym_trans))
    without_t = float(mssd(R_est, t_est, R_gt, t_gt, pts, sym_rots))
    assert with_t < 1e-6
    assert without_t > 0.01  # dropping S_t mis-places by ~2 cm


def test_numpy_twins_match_jax_mssd_mspd():
    """bop_score's host-side per-pair scorers must equal the batched jax
    versions (same symmetry-translation handling)."""
    import jax.numpy as jnp

    from rdpn6d_tpu.evaluation.bop_errors import (
        mspd, mspd_np, mssd, mssd_np)

    rng = np.random.RandomState(3)
    pts = rng.rand(50, 3).astype(np.float64) * 0.1
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])

    def rot(v):
        import cv2
        return cv2.Rodrigues(np.asarray(v, np.float64))[0]

    R_est, R_gt = rot([0.1, -0.2, 0.3]), rot([0.15, -0.1, 0.25])
    t_est = np.array([0.02, -0.01, 0.6])
    t_gt = np.array([0.0, 0.0, 0.62])
    sym_rots = np.stack([np.eye(3), rot([0, 0, np.pi])])
    sym_trans = np.array([[0.0, 0, 0], [0.01, -0.005, 0.002]])

    for st in (None, sym_trans):
        a = mssd_np(R_est, t_est, R_gt, t_gt, pts, sym_rots, sym_trans=st)
        b = float(mssd(jnp.asarray(R_est), jnp.asarray(t_est),
                       jnp.asarray(R_gt), jnp.asarray(t_gt),
                       jnp.asarray(pts), jnp.asarray(sym_rots),
                       sym_trans=None if st is None else jnp.asarray(st)))
        assert abs(a - b) < 1e-5, (a, b, st is None)
        c = mspd_np(R_est, t_est, R_gt, t_gt, pts, sym_rots, K,
                    sym_trans=st)
        d = float(mspd(jnp.asarray(R_est), jnp.asarray(t_est),
                       jnp.asarray(R_gt), jnp.asarray(t_gt),
                       jnp.asarray(pts), jnp.asarray(sym_rots),
                       jnp.asarray(K),
                       sym_trans=None if st is None else jnp.asarray(st)))
        assert abs(c - d) < 1e-3, (c, d, st is None)
