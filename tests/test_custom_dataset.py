"""Custom-dataset registration (data/custom.py) — the counterpart of the
reference's per-dataset loader modules (delta_train.py): one call over a
BOP-layout tree must yield a working ref + splits for the parametric
builders."""

import json

import numpy as np
import pytest

from rdpn6d_tpu.data.bop import available_splits, build_split_records, get_split
from rdpn6d_tpu.data.custom import register_custom_dataset
from rdpn6d_tpu.data.refs import REFS, get_ref
from rdpn6d_tpu.data.synthetic import render_cube_depth


@pytest.fixture()
def widget_tree(tmp_path):
    import cv2

    root = tmp_path / "widget_ds"
    mdir = root / "models"
    mdir.mkdir(parents=True)
    from tests.test_eval_runner import write_cube_ply

    write_cube_ply(str(mdir / "obj_000003.ply"))
    (mdir / "models_info.json").write_text(json.dumps(
        {"3": {"diameter": 173.2, "size_x": 100.0, "size_y": 100.0,
               "size_z": 100.0}}))

    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])
    for subdir, n_im in (("train", 3), ("test", 2)):
        sdir = root / subdir / "000001"
        (sdir / "rgb").mkdir(parents=True)
        (sdir / "depth").mkdir()
        (sdir / "mask_visib").mkdir()
        gt, cam, info = {}, {}, {}
        rng = np.random.RandomState(0 if subdir == "train" else 1)
        for im_id in range(n_im):
            R = cv2.Rodrigues(rng.randn(3) * 0.4)[0]
            t = np.array([0.0, 0.0, 0.8])
            depth, _ = render_cube_depth(R, t, K, 480, 640)
            mask = (depth > 0).astype(np.uint8) * 255
            cv2.imwrite(str(sdir / "rgb" / f"{im_id:06d}.png"),
                        np.dstack([mask] * 3))
            cv2.imwrite(str(sdir / "depth" / f"{im_id:06d}.png"),
                        (depth * 1000).astype(np.uint16))
            cv2.imwrite(str(sdir / "mask_visib" / f"{im_id:06d}_000000.png"),
                        mask)
            gt[str(im_id)] = [{"cam_R_m2c": R.flatten().tolist(),
                               "cam_t_m2c": (t * 1000).tolist(),
                               "obj_id": 3}]
            cam[str(im_id)] = {"cam_K": K.flatten().tolist(),
                               "depth_scale": 1.0}
            info[str(im_id)] = [{"visib_fract": 1.0,
                                 "bbox_visib": [200, 150, 200, 180]}]
        (sdir / "scene_gt.json").write_text(json.dumps(gt))
        (sdir / "scene_camera.json").write_text(json.dumps(cam))
        (sdir / "scene_gt_info.json").write_text(json.dumps(info))
    return root


def test_register_discovers_everything(widget_tree):
    REFS.pop("widget", None)
    ref = register_custom_dataset("widget", root=str(widget_tree))
    try:
        assert ref.id2obj == {3: "obj_3"}
        assert ref.diameters_mm == (173.2,)
        assert ref.diameters_reliable
        assert ref.diameter_m(3) == pytest.approx(0.1732)
        assert np.allclose(ref.K(), [[500, 0, 320], [0, 500, 240],
                                     [0, 0, 1]])
        assert (ref.width, ref.height) == (640, 480)
        assert ref.root == str(widget_tree)
        assert get_ref("widget").name == "widget"

        assert {"widget_train", "widget_test"} <= set(available_splits())
        assert get_split("widget_train").filter_invalid
        assert not get_split("widget_test").filter_invalid

        recs = build_split_records(get_split("widget_train"))
        assert len(recs) == 3
        r = recs[0]
        assert r["obj_id"] == 3 and r["scene_id"] == 1
        assert r["rgb_path"].startswith(str(widget_tree))
        assert r["R"].shape == (3, 3)

        test_recs = build_split_records(get_split("widget_test"))
        assert len(test_recs) == 2
    finally:
        REFS.pop("widget", None)
        get_ref.cache_clear()


def test_register_duplicate_and_overwrite(widget_tree):
    REFS.pop("widget", None)
    register_custom_dataset("widget", root=str(widget_tree))
    try:
        with pytest.raises(ValueError, match="already registered"):
            register_custom_dataset("widget", root=str(widget_tree))
        ref2 = register_custom_dataset("widget", root=str(widget_tree),
                                       overwrite=True, depth_factor=500.0)
        assert get_ref("widget").depth_factor == 500.0
        assert ref2.depth_factor == 500.0
    finally:
        REFS.pop("widget", None)
        get_ref.cache_clear()


def test_register_missing_root(tmp_path):
    with pytest.raises(FileNotFoundError):
        register_custom_dataset("nope", root=str(tmp_path / "absent"))


def test_explicit_overrides(widget_tree):
    REFS.pop("widget2", None)
    ref = register_custom_dataset(
        "widget2", root=str(widget_tree),
        id2obj={3: "gizmo"}, camera_matrix=((1.0, 0, 0), (0, 1.0, 0),
                                            (0, 0, 1.0)),
        width=1024, height=768)
    try:
        assert ref.id2obj == {3: "gizmo"}
        assert ref.objects == ["gizmo"]
        assert (ref.width, ref.height) == (1024, 768)
        assert np.allclose(ref.K(), np.eye(3))
        # diameters still discovered from models_info
        assert ref.diameter_m(3) == pytest.approx(0.1732)
    finally:
        REFS.pop("widget2", None)
        get_ref.cache_clear()
