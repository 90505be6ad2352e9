"""On-disk BOP-layout integration: write a tiny synthetic dataset, build
records, decode frames, run the loader — the full host data path."""

import json
import os

import numpy as np
import pytest

import rdpn6d_tpu.data.refs as refs_mod
from rdpn6d_tpu.config import Config
from rdpn6d_tpu.data.bop import Split, build_split_records
from rdpn6d_tpu.data.loader import RecordDecoder, train_frame_iterator
from rdpn6d_tpu.data.assets import synthetic_class_assets
from rdpn6d_tpu.data.synthetic import render_cube_depth


@pytest.fixture(scope="module")
def tiny_bop_dataset(tmp_path_factory, monkeypatch_module=None):
    """A 1-scene, 2-image BOP dataset of a cube under dataset root 'lm'."""
    import cv2

    root = tmp_path_factory.mktemp("bop")
    sdir = root / "lm" / "train" / "000001"
    (sdir / "rgb").mkdir(parents=True)
    (sdir / "depth").mkdir()
    (sdir / "mask_visib").mkdir()

    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]])
    scene_gt, scene_cam, scene_info = {}, {}, {}
    rng = np.random.RandomState(0)
    for im_id in range(2):
        R = cv2.Rodrigues(rng.randn(3) * 0.5)[0]
        t = np.array([0.02, -0.01, 0.7])
        depth, xyz = render_cube_depth(R, t, K, 480, 640)
        mask = (depth > 0).astype(np.uint8) * 255
        rgb = np.dstack([mask] * 3)
        cv2.imwrite(str(sdir / "rgb" / f"{im_id:06d}.png"), rgb)
        cv2.imwrite(str(sdir / "depth" / f"{im_id:06d}.png"),
                    (depth * 1000).astype(np.uint16))
        cv2.imwrite(str(sdir / "mask_visib" / f"{im_id:06d}_000000.png"),
                    mask)
        ys, xs = np.nonzero(mask)
        scene_gt[str(im_id)] = [{
            "cam_R_m2c": R.flatten().tolist(),
            "cam_t_m2c": (t * 1000).tolist(), "obj_id": 1}]
        scene_cam[str(im_id)] = {"cam_K": K.flatten().tolist(),
                                 "depth_scale": 1.0}
        scene_info[str(im_id)] = [{
            "bbox_visib": [int(xs.min()), int(ys.min()),
                           int(xs.max() - xs.min()),
                           int(ys.max() - ys.min())],
            "visib_fract": 1.0}]
    (sdir / "scene_gt.json").write_text(json.dumps(scene_gt))
    (sdir / "scene_camera.json").write_text(json.dumps(scene_cam))
    (sdir / "scene_gt_info.json").write_text(json.dumps(scene_info))
    return str(root)


def test_records_and_loader(tiny_bop_dataset, monkeypatch):
    monkeypatch.setattr(refs_mod, "DATA_ROOT", tiny_bop_dataset)

    split = Split("tiny_train", "lm", "train", scene_ids=(1,))
    records = build_split_records(split, flatten=True)
    assert len(records) == 2
    rec = records[0]
    assert rec["obj_id"] == 1 and rec["K"].shape == (3, 3)
    assert os.path.exists(rec["rgb_path"])
    np.testing.assert_allclose(rec["t"][2], 0.7, atol=1e-6)

    cfg = Config().apply_opts(["head.num_regions=4"])
    assets = synthetic_class_assets(num_regions=4)
    decoder = RecordDecoder(cfg, assets, num_pm_points=64)
    sample = decoder(rec)
    assert sample["rgb"].shape == (480, 640, 3)
    assert sample["depth"].shape == (480, 640)
    # depth-derived xyz fallback (no xyz_crop pkl): model-frame coords
    # inside the cube bounds on the mask
    m = sample["mask_visib"] > 0
    assert m.sum() > 100
    assert np.abs(sample["xyz"][m]).max() < 0.06 + 1e-3
    assert sample["roi_points"].shape == (64, 3)

    # caching works
    cache = os.path.join(tiny_bop_dataset, "cache")
    r1 = build_split_records(split, cache_dir=cache, flatten=True)
    r2 = build_split_records(split, cache_dir=cache, flatten=True)
    assert len(r1) == len(r2) == 2

    # the infinite loader yields stacked batches
    from rdpn6d_tpu.data.bop import register_split
    register_split(Split("tiny_train_reg", "lm", "train", scene_ids=(1,)))
    it = train_frame_iterator(cfg, "tiny_train_reg", decoder=decoder,
                              batch_size=2)
    batch = next(it)
    assert batch["rgb"].shape == (2, 480, 640, 3)
    assert batch["gt_rot"].shape == (2, 3, 3)

    # the thread-pool decode preserves sampler order: same seed -> the
    # same batches regardless of worker count
    it1 = train_frame_iterator(cfg, "tiny_train_reg", decoder=decoder,
                               batch_size=2, seed=7, num_workers=1)
    it8 = train_frame_iterator(cfg, "tiny_train_reg", decoder=decoder,
                               batch_size=2, seed=7, num_workers=8)
    for _ in range(3):
        b1, b8 = next(it1), next(it8)
        np.testing.assert_array_equal(b1["rgb"], b8["rgb"])
        np.testing.assert_array_equal(b1["gt_rot"], b8["gt_rot"])


def test_ycb_style_records(tmp_path, monkeypatch):
    """MP6D/YCB-Video layout: -color/-depth/-label pngs + -meta.mat."""
    import cv2
    from scipy.io import savemat

    root = tmp_path / "bopy"
    sdir = root / "mp6d" / "data" / "0001"
    sdir.mkdir(parents=True)
    K = np.array([[567.5, 0, 312.7], [0, 569.4, 257.2], [0, 0, 1]])
    R = cv2.Rodrigues(np.array([0.2, 0.1, -0.3]))[0]
    t = np.array([0.01, 0.02, 0.6])
    depth, xyz = render_cube_depth(R.astype(np.float32),
                                   t.astype(np.float32),
                                   K.astype(np.float32), 480, 640)
    label = (depth > 0).astype(np.uint8) * 3  # obj_id 3 label image
    cv2.imwrite(str(sdir / "000000-color.png"),
                np.dstack([label * 80] * 3))
    cv2.imwrite(str(sdir / "000000-depth.png"),
                (depth * 1000).astype(np.uint16))
    cv2.imwrite(str(sdir / "000000-label.png"), label)
    # reference MP6D conventions (mp6d.py:177,206): poses in mm,
    # factor_depth in mm per raw depth unit (depth png here is mm -> 1.0)
    savemat(str(sdir / "000000-meta.mat"), {
        "cls_indexes": np.array([[3]]),
        "poses": np.dstack([np.hstack([R, t[:, None] * 1000.0])]),
        "intrinsic_matrix": K,
        "factor_depth": np.array([[1.0]]),
    })

    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(root))
    from rdpn6d_tpu.data.bop import register_split
    register_split(Split("mp6d_tiny", "mp6d", "data", scene_ids=(1,)))
    records = build_split_records(get_split_safe("mp6d_tiny"))
    assert len(records) == 1
    rec = records[0]
    assert rec["obj_id"] == 3
    np.testing.assert_allclose(rec["t"], t, atol=1e-6)
    np.testing.assert_allclose(rec["K"], K, atol=1e-5)

    cfg = Config().apply_opts(["head.num_regions=4"])
    assets = synthetic_class_assets(num_regions=4)
    assets.obj_ids[:] = [3]  # cube registered as obj 3
    decoder = RecordDecoder(cfg, assets, num_pm_points=32)
    sample = decoder(rec)
    assert sample["mask_visib"].sum() > 100
    m = sample["mask_visib"] > 0
    assert np.abs(sample["xyz"][m]).max() < 0.06


def get_split_safe(name):
    from rdpn6d_tpu.data.bop import get_split
    return get_split(name)


def test_ycb_style_flatten_false_groups_per_image(tmp_path, monkeypatch):
    """flatten=False must yield per-image records with an instances list
    for NON-bop layouts too (round-2 fix: builders ignored the flag)."""
    import cv2
    from scipy.io import savemat

    root = tmp_path / "bopg"
    sdir = root / "mp6d" / "data" / "0001"
    sdir.mkdir(parents=True)
    K = np.array([[567.5, 0, 312.7], [0, 569.4, 257.2], [0, 0, 1]])
    cv2.imwrite(str(sdir / "000000-color.png"), np.zeros((4, 4, 3),
                                                         np.uint8))
    cv2.imwrite(str(sdir / "000000-depth.png"),
                np.full((4, 4), 900, np.uint16))
    cv2.imwrite(str(sdir / "000000-label.png"), np.zeros((4, 4), np.uint8))
    savemat(str(sdir / "000000-meta.mat"), {
        "cls_indexes": np.array([[3, 5]]),
        "poses": np.dstack([np.hstack([np.eye(3),
                                       np.array([[0.0], [0.0], [600.0]])])
                            for _ in range(2)]),
        "intrinsic_matrix": K,
        "factor_depth": np.array([[1.0]]),
    })
    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(root))
    from rdpn6d_tpu.data.bop import register_split
    register_split(Split("mp6d_group_t", "mp6d", "data", scene_ids=(1,)))
    recs = build_split_records(get_split_safe("mp6d_group_t"),
                               flatten=False)
    assert len(recs) == 1
    assert [i["obj_id"] for i in recs[0]["instances"]] == [3, 5]
    assert "obj_id" not in recs[0]  # image-level fields only
