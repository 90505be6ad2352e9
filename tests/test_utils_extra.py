"""Mask utils, view sampler, host PnP, detections: unit tests."""

import numpy as np

from rdpn6d_tpu.ops.pnp_host import correspondences_from_maps, pnp_ransac
from rdpn6d_tpu.ops.view_sampler import (
    fibonacci_sphere,
    icosphere_views,
    look_at_rotations,
)
from rdpn6d_tpu.utils.mask import (
    dilate_mask,
    mask_bbox_xyxy,
    mask_edges,
    mask_to_rle,
    rle_to_mask,
)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = rng.rand(37, 53) > 0.6
    rle = mask_to_rle(mask)
    back = rle_to_mask(rle)
    np.testing.assert_array_equal(back, mask)


def test_rle_empty_and_full():
    empty = np.zeros((8, 8), bool)
    full = np.ones((8, 8), bool)
    np.testing.assert_array_equal(rle_to_mask(mask_to_rle(empty)), empty)
    np.testing.assert_array_equal(rle_to_mask(mask_to_rle(full)), full)


def test_mask_bbox_and_edges():
    m = np.zeros((20, 20), np.uint8)
    m[5:10, 7:15] = 1
    np.testing.assert_array_equal(mask_bbox_xyxy(m), [7, 5, 14, 9])
    e = mask_edges(m)
    assert e.sum() > 0
    assert dilate_mask(m).sum() > m.sum()


def test_view_samplers():
    v = fibonacci_sphere(100)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-9)
    vi = icosphere_views(40)
    assert len(vi) >= 40
    np.testing.assert_allclose(np.linalg.norm(vi, axis=1), 1.0, atol=1e-9)
    R = look_at_rotations(v)
    eye = R @ np.swapaxes(R, 1, 2)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(v), 1, 1)),
                               atol=1e-9)


def test_pnp_ransac_recovers_pose():
    import cv2

    rng = np.random.RandomState(0)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float64)
    R = cv2.Rodrigues(np.array([0.4, -0.3, 0.2]))[0]
    t = np.array([0.05, -0.02, 0.7])
    p3 = rng.randn(200, 3) * 0.05
    cam = p3 @ R.T + t
    uv = cam @ K.T
    p2 = uv[:, :2] / uv[:, 2:3]
    R_est, t_est = pnp_ransac(p3, p2, K)
    np.testing.assert_allclose(R_est, R, atol=1e-3)
    np.testing.assert_allclose(t_est, t, atol=1e-3)


def test_correspondences_from_maps_geometry():
    # map cell -> original pixel must invert the crop affine
    coord = np.zeros((64, 64, 3), np.float32)
    mask = np.zeros((64, 64))
    mask[32, 32] = 1  # crop center cell
    p3, p2 = correspondences_from_maps(coord, mask,
                                       np.array([300.0, 200.0]), 128.0)
    np.testing.assert_allclose(p2[0], [300.0, 200.0], atol=1e-5)


def test_detections_roundtrip(tmp_path):
    import json

    from rdpn6d_tpu.data.detections import attach_detections, load_detections

    dets = [{"scene_id": 1, "im_id": 2, "obj_id": 5,
             "bbox_est": [10, 20, 30, 40], "score": 0.9},
            {"scene_id": 1, "im_id": 2, "obj_id": 5,
             "bbox_est": [11, 21, 30, 40], "score": 0.5}]
    path = tmp_path / "dets.json"
    path.write_text(json.dumps(dets))
    loaded = load_detections(str(path))
    assert len(loaded[(1, 2)]) == 2
    recs = [{"scene_id": 1, "im_id": 2, "obj_id": 5, "K": None},
            {"scene_id": 1, "im_id": 3, "obj_id": 5, "K": None}]
    out = attach_detections(recs, loaded, topk_per_obj=1)
    assert len(out) == 1  # im 3 has no det -> dropped; top-1 kept
    np.testing.assert_allclose(out[0]["bbox_visib"], [10, 20, 40, 60])
    assert out[0]["det_score"] == 0.9


def test_record_rng_rerolls_per_visit():
    """Aug randomness is deterministic per (record, visit) but re-rolls
    across visits — epoch N of a long run must not replay epoch 0's
    change_bg/truncate draws (the reference re-rolls per __getitem__)."""
    from rdpn6d_tpu.config import Config
    from rdpn6d_tpu.data.loader import RecordDecoder

    cfg = Config()
    dec = RecordDecoder(cfg, assets=None, num_pm_points=16, seed=3)
    rec = {"scene_id": 2, "im_id": 7, "inst_idx": 1}
    v0a = dec._record_rng(rec, visit=0).rand(4)
    v0b = dec._record_rng(rec, visit=0).rand(4)
    v1 = dec._record_rng(rec, visit=1).rand(4)
    assert np.allclose(v0a, v0b)       # deterministic per visit
    assert not np.allclose(v0a, v1)    # fresh draws on the next visit
