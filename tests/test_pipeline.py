"""End-to-end preprocessing-graph tests on an analytic cube scene, plus
cv2 parity for the affine-crop convention (the reference's exact pipeline,
data_loader.py:813-816 + data_utils.py:81-152)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdpn6d_tpu.config import Config
from rdpn6d_tpu.data.pipeline import preprocess_roi
from rdpn6d_tpu.data.synthetic import render_cube_depth
from rdpn6d_tpu.geometry import recover_pose_centroid_z, ortho6d_to_mat
from rdpn6d_tpu.ops import crop_resize, fps_numpy
from rdpn6d_tpu.data.synthetic import cube_points


def _cv2_reference_crop(img, center, scale, out_size, interp):
    """The reference's CenterNet affine crop, independently re-derived with
    cv2.getAffineTransform from 3 correspondences."""
    r = out_size / scale
    src = np.float32([center,
                      [center[0], center[1] - scale / 2],
                      [center[0] - scale / 2, center[1] - scale / 2]])
    dst = np.float32([[out_size / 2, out_size / 2],
                      [out_size / 2, 0],
                      [0, 0]])
    M = cv2.getAffineTransform(src, dst)
    return cv2.warpAffine(np.asarray(img), M, (out_size, out_size),
                          flags=interp)


@pytest.mark.parametrize("interp_name,cv2_flag", [
    ("bilinear", cv2.INTER_LINEAR), ("nearest", cv2.INTER_NEAREST)])
def test_crop_matches_cv2(interp_name, cv2_flag):
    rng = np.random.RandomState(0)
    img = rng.rand(120, 160).astype(np.float32)
    center, scale, out = np.array([80.0, 60.0]), 72.0, 32
    ours = np.asarray(crop_resize(jnp.asarray(img), jnp.asarray(center),
                                  scale, out, interp_name))
    ref = _cv2_reference_crop(img, center, scale, out, cv2_flag)
    if interp_name == "nearest":
        # rounding ties may differ on exact half-pixels; allow tiny mismatch
        frac_diff = np.mean(ours != ref)
        assert frac_diff < 0.05, frac_diff
    else:
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_nearest_crop_tie_rounding_matches_cv2_exactly():
    """cv2.warpAffine INTER_NEAREST rounds via cvRound (half-to-even), so
    jnp.round matches EXACTLY even when every sample lands on a .5 tie
    (r=2 downscale with integer-aligned center)."""
    from rdpn6d_tpu.ops.warp import crop_affine

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (480, 640)).astype(np.float32)
    center, scale, out = np.array([320.0, 240.0], np.float32), 512.0, 256
    A = np.asarray(crop_affine(jnp.asarray(center),
                               jnp.asarray(np.float32(scale)), out))
    ref = cv2.warpAffine(img, A, (out, out), flags=cv2.INTER_NEAREST)
    got = np.asarray(crop_resize(jnp.asarray(img), jnp.asarray(center),
                                 np.float32(scale), out, "nearest"))
    assert (ref == got).all()


@pytest.fixture(scope="module")
def cube_scene():
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float32)
    R = cv2.Rodrigues(np.array([0.3, -0.2, 0.5]))[0].astype(np.float32)
    t = np.array([0.05, -0.03, 0.7], np.float32)
    depth, xyz = render_cube_depth(R, t, K, 480, 640)
    return K, R, t, depth, xyz


@pytest.fixture(scope="module")
def processed(cube_scene):
    K, R, t, depth, xyz = cube_scene
    cfg = Config()
    pts = cube_points()
    fps = pts[fps_numpy(pts, cfg.head.num_regions)]
    mask = (depth > 0).astype(np.float32)
    ys, xs = np.nonzero(mask)
    bbox = np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float32)
    proj = K @ t
    sample = {
        "rgb": jnp.asarray(np.random.RandomState(0).rand(480, 640, 3) * 255,
                           jnp.float32),
        "depth": jnp.asarray(depth),
        "xyz": jnp.asarray(xyz),
        "mask_visib": jnp.asarray(mask),
        "K": jnp.asarray(K),
        "bbox": jnp.asarray(bbox),
        "gt_rot": jnp.asarray(R),
        "gt_trans": jnp.asarray(t),
        "fps": jnp.asarray(fps),
        "extent": jnp.asarray([0.1, 0.1, 0.1], jnp.float32),
        "centroid_2d": jnp.asarray(proj[:2] / proj[2], jnp.float32),
    }
    cfg_small = cfg
    out = preprocess_roi(cfg_small, sample, jax.random.PRNGKey(0),
                         train=True)
    return cfg, sample, out, (K, R, t, depth, xyz, fps)


def test_pipeline_shapes(processed):
    cfg, sample, out, _ = processed
    assert out["roi_img"].shape == (256, 256, 6)
    assert out["roi_coord_2d"].shape == (64, 64, 5)
    assert out["roi_xyz"].shape == (64, 64, 3)
    assert out["roi_region"].shape == (64, 64)
    assert out["roi_mask_visib"].shape == (64, 64)


def test_pipeline_mask_consistent(processed):
    cfg, sample, out, _ = processed
    m = np.asarray(out["roi_mask_obj"])
    assert 0.03 < m.mean() < 0.9  # object occupies part of the crop
    # region labels are nonzero exactly on the mask
    region = np.asarray(out["roi_region"])
    np.testing.assert_array_equal(region > 0, m > 0)


def test_pipeline_residual_roundtrip(processed):
    """coord target decodes back to the model-frame xyz:
    xyz = R^T((coord - 0.5) * extent) + fps[region - 1]."""
    cfg, sample, out, (K, R, t, depth, xyz, fps) = processed
    coord = np.asarray(out["roi_xyz"])
    region = np.asarray(out["roi_region"])
    mask = np.asarray(out["roi_mask_obj"]) > 0
    # recompute the nearest-cropped GT xyz
    roi_xyz_raw = np.asarray(crop_resize(
        sample["xyz"], out["bbox_center"], out["scale"], 64, "nearest"))
    delta_rot = (coord - 0.5) * 0.1
    delta = np.einsum("ji,hwj->hwi", R, delta_rot)
    rec = delta + fps[np.clip(region - 1, 0, None)]
    err = np.abs(rec - roi_xyz_raw)[mask]
    assert err.max() < 1e-5, err.max()


def test_pipeline_depth_xyz_consistent(processed):
    """depth-XYZ channel times resize_ratio equals R @ xyz_model + t on the
    object (the crop-warped-K backprojection is correct)."""
    cfg, sample, out, (K, R, t, depth, xyz, fps) = processed
    rr = float(out["resize_ratio"])
    depth_xyz = np.asarray(out["roi_img"][..., 3:6]) * rr
    xyz256 = np.asarray(crop_resize(
        sample["xyz"], out["bbox_center"], out["scale"], 256, "nearest"))
    m256 = (np.abs(xyz256).sum(-1) > 0)
    # also require valid depth sampled (bilinear edge pixels mix with bg 0)
    dep256 = depth_xyz[..., 2]
    valid = m256 & (dep256 > 0.1)
    cam_pts = np.einsum("ij,hwj->hwi", R, xyz256) + t
    err = np.linalg.norm((depth_xyz - cam_pts), axis=-1)[valid]
    # median error small (edges suffer from interpolation)
    assert np.median(err) < 5e-3, np.median(err)


def test_pipeline_pose_target_roundtrip(processed):
    """Feeding the GT targets through on-device pose recovery returns the GT
    pose — the train/test label algebra is self-consistent."""
    cfg, sample, out, (K, R, t, depth, xyz, fps) = processed
    R_allo = ortho6d_to_mat(out["gt_allo_rot6d"])
    tr = out["trans_ratio"]
    R_rec, t_rec = recover_pose_centroid_z(
        R_allo[None], tr[None, :2], tr[None, 2], jnp.asarray(K)[None],
        out["bbox_center"][None], out["roi_wh"][None],
        out["resize_ratio"][None])
    np.testing.assert_allclose(np.asarray(t_rec[0]), t, atol=1e-4)
    np.testing.assert_allclose(np.asarray(R_rec[0]), R, atol=1e-4)


def test_grouped_preprocess_matches_stacked(processed):
    """Frame-deduplicated path == per-ROI stacked path."""
    from rdpn6d_tpu.data.pipeline import (
        preprocess_batch,
        preprocess_rois_grouped,
    )

    cfg, sample, _, _ = processed
    # two ROIs sharing ONE frame, different boxes
    frames = {k: jnp.asarray(np.asarray(sample[k]))[None]
              for k in ("rgb", "depth", "K")}
    bbox2 = jnp.stack([sample["bbox"], sample["bbox"] + 10.0])
    rois = {
        "frame_idx": jnp.array([0, 0], jnp.int32),
        "bbox": bbox2,
        "fps": jnp.stack([sample["fps"]] * 2),
        "extent": jnp.stack([sample["extent"]] * 2),
    }
    out_g = preprocess_rois_grouped(Config(), frames, rois,
                                    jax.random.PRNGKey(0), train=False)

    stacked = {
        "rgb": jnp.stack([sample["rgb"]] * 2),
        "depth": jnp.stack([sample["depth"]] * 2),
        "K": jnp.stack([sample["K"]] * 2),
        "bbox": bbox2,
        "fps": rois["fps"],
        "extent": rois["extent"],
    }
    out_s = preprocess_batch(Config(), stacked, jax.random.PRNGKey(0),
                             train=False)
    np.testing.assert_allclose(np.asarray(out_g["roi_img"]),
                               np.asarray(out_s["roi_img"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_g["roi_coord_2d"]),
                               np.asarray(out_s["roi_coord_2d"]),
                               atol=1e-5)


def test_dzi_degenerate_bbox_no_nan():
    """A zero-area detection box must not produce scale=0 -> NaN crops
    (scale is clamped to >= 1 px)."""
    from rdpn6d_tpu.data.pipeline import dzi_jitter

    key = jax.random.PRNGKey(0)
    bbox = jnp.asarray([100.0, 50.0, 100.0, 50.0])  # x2==x1, y2==y1
    for enable in (True, False):
        center, scale = dzi_jitter(key, bbox, (480, 640), "uniform", 1.5,
                                   0.25, 0.25, enable=enable)
        assert float(scale) >= 1.0
        assert np.isfinite(np.asarray(center)).all()


def test_dzi_roi10d_and_unknown_type():
    from rdpn6d_tpu.data.pipeline import dzi_jitter

    key = jax.random.PRNGKey(1)
    bbox = jnp.asarray([100.0, 50.0, 200.0, 150.0])
    center, scale = dzi_jitter(key, bbox, (480, 640), "roi10d", 1.5,
                               0.25, 0.25, enable=True)
    # jittered box stays in frame; scale within +-30% of side*pad
    assert 100.0 * 0.7 * 1.5 <= float(scale) <= 100.0 * 1.3 * 1.5
    assert 0 <= float(center[0]) <= 640 and 0 <= float(center[1]) <= 480

    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        dzi_jitter(key, bbox, (480, 640), "truncnorm", 1.5, 0.25, 0.25,
                   enable=True)


def test_grouped_train_with_frame_gt_maps_rejected():
    from rdpn6d_tpu.data.pipeline import preprocess_rois_grouped
    from rdpn6d_tpu.config import Config as _Cfg

    cfg = _Cfg().apply_opts(["data.input_res=64", "data.out_res=16"])
    frames = {"rgb": jnp.zeros((1, 64, 64, 3)),
              "depth": jnp.zeros((1, 64, 64)),
              "K": jnp.eye(3)[None],
              "xyz": jnp.zeros((1, 64, 64, 3))}
    rois = {"frame_idx": jnp.zeros((2,), jnp.int32),
            "bbox": jnp.asarray([[1.0, 1.0, 30.0, 30.0]] * 2),
            "fps": jnp.zeros((2, 32, 3)),
            "extent": jnp.ones((2, 3))}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="per-instance GT"):
        preprocess_rois_grouped(cfg, frames, rois, jax.random.PRNGKey(0),
                                train=True)


def test_nearest_mm_crop_bit_exact():
    """The selection-matrix nearest crop (crop_resize_mm interp="nearest",
    precision="highest") must reproduce the gather path BIT-exactly: a
    one-hot f32 matmul computes v*1.0 + zeros per output pixel. Covers
    exact .5 ties (r=2 integer-aligned window), out-of-bounds windows
    (border zeros) and multi-channel stacks — the production GT mask/xyz
    crop (data/pipeline.py)."""
    from rdpn6d_tpu.ops.warp import crop_resize_mm

    rng = np.random.RandomState(3)
    img = rng.randn(120, 160, 6).astype(np.float32)
    cases = [
        (np.array([80.0, 60.0]), 72.0),     # interior, fractional taps
        (np.array([80.0, 60.0]), 64.0),     # r=2: every sample on a .5 tie
        (np.array([8.0, -4.0]), 96.0),      # window hangs off two edges
        (np.array([200.0, 150.0]), 140.0),  # fully out one corner
    ]
    for center, scale in cases:
        ref = np.asarray(crop_resize(jnp.asarray(img), jnp.asarray(center),
                                     scale, 32, "nearest"))
        mm = np.asarray(crop_resize_mm(jnp.asarray(img),
                                       jnp.asarray(center), scale, 32,
                                       precision="highest",
                                       interp="nearest"))
        np.testing.assert_array_equal(mm, ref)
