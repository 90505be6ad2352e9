"""Geometry core: closed-form identities and round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdpn6d_tpu.geometry import (
    allo_to_ego_mat,
    angular_distance,
    axangle_to_mat,
    backproject_depth,
    closest_rot,
    crop_K,
    ego_to_allo_mat,
    mat_to_ortho6d,
    mat_to_quat,
    ortho6d_to_mat,
    pad_symmetries,
    project,
    quat_mul,
    quat_to_mat,
    recover_pose_centroid_z,
    symmetry_rotations,
    transform_pts,
)


def random_rots(key, n):
    """Uniform-ish random rotations via QR of gaussians."""
    g = jax.random.normal(key, (n, 3, 3))
    q, r = jnp.linalg.qr(g)
    d = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[:, None, :]
    det = jnp.linalg.det(q)
    q = q * jnp.stack([det, jnp.ones_like(det), jnp.ones_like(det)], -1)[:, None, :]
    return q


@pytest.fixture(scope="module")
def rots():
    return random_rots(jax.random.PRNGKey(0), 32)


def test_ortho6d_roundtrip(rots):
    o6d = mat_to_ortho6d(rots)
    back = ortho6d_to_mat(o6d)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rots), atol=1e-5)


def test_ortho6d_gram_schmidt_robust():
    # noisy 6d input still yields a valid rotation
    noisy = jax.random.normal(jax.random.PRNGKey(1), (8, 6))
    R = ortho6d_to_mat(noisy)
    eye = jnp.swapaxes(R, -1, -2) @ R
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (8, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_quat_roundtrip(rots):
    q = mat_to_quat(rots)
    back = quat_to_mat(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rots), atol=1e-5)


def test_quat_mul_matches_mat_mul(rots):
    r1, r2 = rots[:16], rots[16:]
    q = quat_mul(mat_to_quat(r1), mat_to_quat(r2))
    np.testing.assert_allclose(np.asarray(quat_to_mat(q)),
                               np.asarray(r1 @ r2), atol=1e-5)


def test_axangle_basic():
    R = axangle_to_mat(jnp.array([0.0, 0.0, 1.0]), jnp.array(np.pi / 2))
    # 90 deg about z: x -> y
    np.testing.assert_allclose(np.asarray(R @ jnp.array([1.0, 0.0, 0.0])),
                               [0.0, 1.0, 0.0], atol=1e-6)


def test_angular_distance(rots):
    # arccos near 1 is ill-conditioned in f32: ~sqrt(trace error) ≈ few e-3
    assert np.allclose(np.asarray(angular_distance(rots, rots)), 0.0, atol=8e-3)
    Rz = axangle_to_mat(jnp.array([0.0, 0.0, 1.0]), jnp.array(0.3))
    d = angular_distance(rots, rots @ Rz)
    np.testing.assert_allclose(np.asarray(d), 0.3, atol=1e-4)


def test_allo_ego_roundtrip(rots):
    t = jnp.array([[0.2, -0.1, 1.0]] * 32)
    ego = allo_to_ego_mat(t, rots)
    back = ego_to_allo_mat(t, ego)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rots), atol=1e-4)


def test_allo_ego_identity_on_axis(rots):
    # object on the optical axis: allo == ego
    t = jnp.array([[0.0, 0.0, 1.0]] * 32)
    ego = allo_to_ego_mat(t, rots)
    np.testing.assert_allclose(np.asarray(ego), np.asarray(rots), atol=1e-3)


def test_backproject_project_roundtrip():
    K = jnp.array([[572.4, 0.0, 325.3], [0.0, 573.6, 242.0], [0.0, 0.0, 1.0]])
    depth = jnp.full((480, 640), 1.5)
    xyz = backproject_depth(depth, K)
    # project the backprojected points back: must land on the pixel grid
    pts = xyz.reshape(-1, 3)
    uv = project(pts, K, jnp.eye(3), jnp.zeros(3))
    uu, vv = jnp.meshgrid(jnp.arange(640.0), jnp.arange(480.0))
    expect = jnp.stack([uu.ravel(), vv.ravel()], -1)
    np.testing.assert_allclose(np.asarray(uv), np.asarray(expect), atol=1e-2)


def test_crop_K_backproject_consistency():
    """Back-projecting through the crop-warped K must give the same camera-frame
    XYZ as back-projecting the full frame (reference data_loader.py:744-763)."""
    K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])
    # affine mapping src square (center 300,200, side 128) -> 64x64 crop
    s = 64.0 / 128.0
    affine = jnp.array([[s, 0.0, 32.0 - 300.0 * s], [0.0, s, 32.0 - 200.0 * s]])
    Kc = crop_K(K, affine)
    # a point at depth z projecting to src pixel (300, 200) must project to
    # crop pixel (32, 32) under Kc
    z = 1.2
    x = (300.0 - 320.0) * z / 500.0
    y = (200.0 - 240.0) * z / 500.0
    uv = project(jnp.array([[x, y, z]]), Kc, jnp.eye(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(uv[0]), [32.0, 32.0], atol=1e-3)


def test_recover_pose_centroid_z_roundtrip(rots):
    """Forward-generate labels the way the data pipeline does, then recover."""
    n = 8
    K = jnp.tile(jnp.array([[572.4, 0.0, 325.3],
                            [0.0, 573.6, 242.0],
                            [0.0, 0.0, 1.0]]), (n, 1, 1))
    t_gt = jnp.stack([
        jnp.linspace(-0.2, 0.2, n),
        jnp.linspace(-0.1, 0.1, n),
        jnp.linspace(0.6, 1.4, n),
    ], -1)
    R_ego_gt = rots[:n]
    # label construction (reference data_loader.py:1005-1010)
    proj_c = project(t_gt[:, None, :], K, jnp.tile(jnp.eye(3), (n, 1, 1)),
                     jnp.zeros((n, 3)))[:, 0]
    bbox_center = proj_c + jnp.array([5.0, -3.0])  # jittered box center
    bbox_wh = jnp.full((n, 2), 96.0)
    resize_ratio = jnp.full((n,), 64.0 / 128.0)
    centroid_rel = (proj_c - bbox_center) / bbox_wh
    z_rel = t_gt[:, 2] / resize_ratio
    R_allo_gt = ego_to_allo_mat(t_gt, R_ego_gt)

    R_rec, t_rec = recover_pose_centroid_z(
        R_allo_gt, centroid_rel, z_rel, K, bbox_center, bbox_wh, resize_ratio)
    np.testing.assert_allclose(np.asarray(t_rec), np.asarray(t_gt), atol=1e-4)
    np.testing.assert_allclose(np.asarray(R_rec), np.asarray(R_ego_gt),
                               atol=1e-4)


def test_symmetry_rotations_discrete():
    info = {"symmetries_discrete": [
        [-1, 0, 0, 0, 0, -1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1]]}
    syms = symmetry_rotations(info)
    assert syms.shape == (2, 3, 3)
    np.testing.assert_allclose(syms[0], np.eye(3), atol=1e-7)


def test_symmetry_rotations_continuous():
    info = {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
    syms = symmetry_rotations(info, max_sym_disc_step=0.5)
    # ceil(pi/0.5)=7 steps -> identity + 6 rotations
    assert syms.shape == (7, 3, 3)
    for s in syms:  # all must fix the z axis
        np.testing.assert_allclose(s @ np.array([0, 0, 1.0]), [0, 0, 1.0],
                                   atol=1e-6)


def test_closest_rot_picks_symmetric_equivalent(rots):
    flip = axangle_to_mat(jnp.array([0.0, 0.0, 1.0]), jnp.array(np.pi))
    sym_bank = pad_symmetries([np.stack([np.eye(3), np.asarray(flip)])])
    syms = jnp.tile(jnp.asarray(sym_bank[0]), (4, 1, 1, 1))
    gt = rots[:4]
    est = gt @ flip  # estimate equals the flipped gt
    best = closest_rot(est, gt, syms)
    np.testing.assert_allclose(np.asarray(angular_distance(best, est)), 0.0,
                               atol=1e-3)


def test_transform_pts(rots):
    pts = jax.random.normal(jax.random.PRNGKey(3), (32, 100, 3))
    t = jnp.ones((32, 3))
    out = transform_pts(pts, rots, t)
    manual = jnp.einsum("bij,bnj->bni", rots, pts) + 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual), atol=1e-5)


def test_log_exp_roundtrip_including_pi():
    """SO(3) log must survive the angle=pi singularity (round-2 fix: the
    skew-part formulation returned 0 for half-turns)."""
    from rdpn6d_tpu.geometry import exp_map, log_map

    rng = np.random.RandomState(0)
    mats = []
    # half-turns about each axis — the degenerate case
    for ax in np.eye(3):
        mats.append(np.asarray(exp_map(jnp.asarray(ax * np.pi))))
    for _ in range(20):
        v = rng.randn(3)
        mats.append(np.asarray(exp_map(jnp.asarray(v))))
    # near-pi
    mats.append(np.asarray(exp_map(jnp.asarray([0.999 * np.pi, 0, 0]))))
    for R in mats:
        v = log_map(jnp.asarray(R))
        R2 = np.asarray(exp_map(v))
        np.testing.assert_allclose(R2, R, atol=2e-5)
    # half-turn magnitude is pi, not 0
    v = np.asarray(log_map(jnp.asarray(np.diag([1.0, -1.0, -1.0]))))
    assert abs(np.linalg.norm(v) - np.pi) < 1e-5


def test_angular_distance_exact_zero():
    from rdpn6d_tpu.geometry import angular_distance

    R = np.asarray(
        [[0.36, 0.48, -0.8], [-0.8, 0.6, 0.0], [0.48, 0.64, 0.6]])
    assert float(angular_distance(jnp.asarray(R), jnp.asarray(R))) == 0.0
