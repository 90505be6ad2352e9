"""Dataset-protocol parity: depth_scale semantics, LM image_set index
splits, YCB-V image_sets/keyframe index files, lm_imgn synthetic loader,
reference xyz_crop layout fallback.

Mirrors reference semantics at ycbv_d2.py:79-130, lm_dataset_d2.py:103-190
and lm_syn_imgn.py:107-190 on tiny synthetic fixtures.
"""

import json
import os
import pickle

import numpy as np
import pytest

import rdpn6d_tpu.data.refs as refs_mod
from rdpn6d_tpu.data.bop import Split, build_split_records
from rdpn6d_tpu.data.loader import _imread_depth


def _write_scene(root, subdir, scene_id, im_ids, obj_ids_per_im,
                 depth_scale=1.0, write_info=True):
    """Minimal BOP scene: jsons only + 1x1 images (decode not exercised)."""
    import cv2

    sdir = root / subdir / f"{scene_id:06d}"
    (sdir / "rgb").mkdir(parents=True, exist_ok=True)
    (sdir / "depth").mkdir(exist_ok=True)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]])
    gt, cam, info = {}, {}, {}
    for im_id in im_ids:
        cv2.imwrite(str(sdir / "rgb" / f"{im_id:06d}.png"),
                    np.zeros((4, 4, 3), np.uint8))
        cv2.imwrite(str(sdir / "depth" / f"{im_id:06d}.png"),
                    np.full((4, 4), 1234, np.uint16))
        gt[str(im_id)] = [
            {"cam_R_m2c": np.eye(3).flatten().tolist(),
             "cam_t_m2c": [0, 0, 700.0], "obj_id": int(o)}
            for o in obj_ids_per_im]
        cam[str(im_id)] = {"cam_K": K.flatten().tolist(),
                           "depth_scale": depth_scale}
        info[str(im_id)] = [{"bbox_visib": [1, 1, 2, 2], "visib_fract": 1.0}
                            for _ in obj_ids_per_im]
    (sdir / "scene_gt.json").write_text(json.dumps(gt))
    (sdir / "scene_camera.json").write_text(json.dumps(cam))
    if write_info:
        (sdir / "scene_gt_info.json").write_text(json.dumps(info))
    return sdir


def test_depth_factor_from_depth_scale(tmp_path, monkeypatch):
    """Regression for the 10x YCB-V depth bug: depth_scale=0.1 must give
    factor 1000/0.1 = 10000 (ycbv_d2.py:128), NOT ref.depth_factor/0.1."""
    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tmp_path))
    _write_scene(tmp_path / "ycbv", "test", 48, [1], [1], depth_scale=0.1)
    recs = build_split_records(
        Split("t_df", "ycbv", "test", scene_ids=(48,)))
    assert recs[0]["depth_factor"] == pytest.approx(10000.0)
    # decoded depth is meters: raw 1234 * 0.1 mm = 0.1234 m
    d = _imread_depth(recs[0]["depth_path"], recs[0]["depth_factor"])
    np.testing.assert_allclose(d, 0.1234, rtol=1e-6)

    # lm: depth_scale=1.0 -> factor 1000
    _write_scene(tmp_path / "lm", "test", 1, [0], [1], depth_scale=1.0)
    recs = build_split_records(Split("t_df2", "lm", "test", scene_ids=(1,)))
    assert recs[0]["depth_factor"] == pytest.approx(1000.0)


def test_lm_image_set_protocol(tmp_path, monkeypatch):
    """lm_13_train semantics: per-object index files over the test scenes,
    each restricted to that scene's object (lm_dataset_d2.py:103-130)."""
    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tmp_path))
    root = tmp_path / "lm"
    # scene 1 = ape, scene 6 = cat; each image carries BOTH objects in gt
    # (filter_scene must keep only the scene's own object)
    _write_scene(root, "test", 1, [0, 1, 2, 3], [1, 6])
    _write_scene(root, "test", 6, [0, 1, 2], [1, 6])
    iset = root / "image_set"
    iset.mkdir()
    (iset / "ape_train.txt").write_text("0\n2\n")
    (iset / "cat_train.txt").write_text("1\n")
    (iset / "ape_test.txt").write_text("1\n3\n")
    (iset / "cat_test.txt").write_text("0\n2\n")

    train = build_split_records(
        Split("t_lm_tr", "lm", "test", objs=("ape", "cat"),
              per_obj_index="image_set/{obj}_train.txt"))
    got = sorted((r["scene_id"], r["im_id"], r["obj_id"]) for r in train)
    assert got == [(1, 0, 1), (1, 2, 1), (6, 1, 6)]

    test = build_split_records(
        Split("t_lm_te", "lm", "test", objs=("ape", "cat"),
              per_obj_index="image_set/{obj}_test.txt",
              filter_invalid=False, ), flatten=False)
    got = sorted((r["scene_id"], r["im_id"]) for r in test)
    assert got == [(1, 1), (1, 3), (6, 0), (6, 2)]
    # per-image records contain only the scene's object
    for r in test:
        assert [i["obj_id"] for i in r["instances"]] == [r["scene_id"]]


def test_registered_lm13_splits_resolve(tmp_path, monkeypatch):
    """The shipped lm_13_train/lm_13_test splits read image_set files."""
    from rdpn6d_tpu.data.bop import get_split
    from rdpn6d_tpu.data.refs import LM13_OBJECTS, LM

    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tmp_path))
    root = tmp_path / "lm"
    iset = root / "image_set"
    iset.mkdir(parents=True)
    for obj in LM13_OBJECTS:
        oid = LM.obj2id[obj]
        _write_scene(root, "test", oid, [0, 1], [oid])
        (iset / f"{obj}_train.txt").write_text("0\n")
        (iset / f"{obj}_test.txt").write_text("1\n")

    train = build_split_records(get_split("lm_13_train"))
    assert len(train) == 13 and all(r["im_id"] == 0 for r in train)
    test = build_split_records(get_split("lm_13_test"), flatten=False)
    assert len(test) == 13 and all(r["im_id"] == 1 for r in test)


def test_ycbv_index_file_and_fallback(tmp_path, monkeypatch):
    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tmp_path))
    root = tmp_path / "ycbv"
    _write_scene(root, "test", 48, [10, 11, 12], [1])
    _write_scene(root, "test", 50, [5], [2])
    (root / "image_sets").mkdir()
    (root / "image_sets" / "keyframe.txt").write_text(
        "48/10\n48/12\n50/5\n")

    recs = build_split_records(
        Split("t_kf", "ycbv", "test", scene_ids=(48, 50),
              index_file="image_sets/keyframe.txt", filter_invalid=False))
    got = sorted((r["scene_id"], r["im_id"]) for r in recs)
    assert got == [(48, 10), (48, 12), (50, 5)]

    # missing index file -> fall back to full scene list
    recs = build_split_records(
        Split("t_kf2", "ycbv", "test", scene_ids=(48, 50),
              index_file="image_sets/nonexistent.txt",
              filter_invalid=False))
    assert len(recs) == 4


def test_xyz_crop_reference_layout(tmp_path, monkeypatch):
    """xyz_path resolves the reference's shared-tree layout
    (<subdir>/xyz_crop/<scene>/<im>_<inst>-xyz.pkl, ycbv_d2.py:225)."""
    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tmp_path))
    root = tmp_path / "lm"
    _write_scene(root, "test", 1, [0], [1])
    xdir = root / "test" / "xyz_crop" / "000001"
    xdir.mkdir(parents=True)
    ref_style = xdir / "000000_000000-xyz.pkl"
    ref_style.write_bytes(pickle.dumps({"xyxy": [0, 0, 1, 1],
                                        "xyz_crop": np.zeros((2, 2, 3))}))
    recs = build_split_records(Split("t_xyz", "lm", "test", scene_ids=(1,)))
    assert recs[0]["xyz_path"] == str(ref_style)

    # our tool layout wins when present
    ours = root / "test" / "000001" / "xyz_crop"
    ours.mkdir(parents=True)
    (ours / "000000_000000.pkl").write_bytes(pickle.dumps({}))
    recs = build_split_records(Split("t_xyz2", "lm", "test", scene_ids=(1,)))
    assert recs[0]["xyz_path"] == str(ours / "000000_000000.pkl")


def test_lm_imgn_records(tmp_path, monkeypatch):
    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tmp_path))
    import cv2

    root = tmp_path / "lm_imgn"
    iset = root / "image_set"
    iset.mkdir(parents=True)
    pose = np.hstack([np.eye(3), [[0.01], [0.02], [0.8]]])
    ids = []
    for i in range(5):
        d = root / "imgn" / "ape"
        d.mkdir(parents=True, exist_ok=True)
        stem = f"{i:06d}"
        cv2.imwrite(str(d / f"{stem}-color.png"),
                    np.zeros((480, 640, 3), np.uint8))
        depth_im = np.zeros((480, 640), np.uint16)
        depth_im[100:120, 200:220] = 800
        cv2.imwrite(str(d / f"{stem}-depth.png"), depth_im)
        np.savetxt(str(d / f"{stem}-pose.txt"), pose, header="pose")
        ids.append(f"ape/{stem}")
    # reference index lines may carry a leading token; last token is the id
    (iset / "train_ape.txt").write_text(
        "\n".join(f"x {i}" for i in ids) + "\n")

    recs = build_split_records(
        Split("t_imgn", "lm_imgn", "imgn", objs=("ape",),
              per_obj_index="image_set/train_{obj}.txt", n_per_obj=3))
    assert len(recs) == 3  # linspace subsample of 5
    r = recs[0]
    assert r["obj_id"] == 1 and r["depth_factor"] == 1000.0
    np.testing.assert_allclose(r["t"], [0.01, 0.02, 0.8], atol=1e-6)
    assert r["rgb_path"].endswith("ape/000000-color.png")
    assert r["xyz_path"].endswith("xyz_crop_imgn/ape/000000-xyz.pkl")

    # decoder end-to-end on an imgn record: depth>0 fallback mask
    from rdpn6d_tpu.config import Config
    from rdpn6d_tpu.data.assets import synthetic_class_assets
    from rdpn6d_tpu.data.loader import RecordDecoder

    cfg = Config().apply_opts(["head.num_regions=4"])
    sample = RecordDecoder(cfg, synthetic_class_assets(num_regions=4),
                           num_pm_points=16)(r)
    assert sample["mask_visib"].sum() == 20 * 20  # depth>0 fallback mask
    np.testing.assert_allclose(sample["depth"][100:120, 200:220], 0.8,
                               atol=1e-6)


def test_itodd_diameter_constants_and_models_info_override(
        tmp_path, monkeypatch):
    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tmp_path))
    ref = refs_mod.get_ref("itodd")
    # built-in dataset constant (ref/itodd_full.py:40) without models_info
    assert ref.diameter_m(1) == pytest.approx(0.0640944)
    # models_info.json on disk takes precedence
    mdir = tmp_path / "itodd" / "models"
    mdir.mkdir(parents=True)
    (mdir / "models_info.json").write_text(json.dumps(
        {"1": {"diameter": 87.5}}))
    assert ref.diameter_m(1) == pytest.approx(0.0875)


def test_attached_detections_keep_xyxy():
    """attach_detections produces xyxy boxes and marks them so decoders
    don't re-apply the xywh->xyxy conversion (est-bbox crop regression)."""
    from rdpn6d_tpu.data.detections import attach_detections

    rec = {"scene_id": 1, "im_id": 0, "obj_id": 1,
           "bbox_visib": np.array([10, 20, 30, 40], np.float32)}
    dets = {(1, 0): [{"obj_id": 1, "bbox": np.array(
        [100.0, 50.0, 180.0, 130.0], np.float32), "score": 0.9,
        "time": -1.0}]}
    out = attach_detections([rec], dets)
    assert len(out) == 1
    assert out[0]["bbox_mode"] == "xyxy"
    np.testing.assert_allclose(out[0]["bbox_visib"],
                               [100.0, 50.0, 180.0, 130.0])


def test_lm_blender_records(tmp_path, monkeypatch):
    """Blender synthetic layout (reference lm_blender.py:112-196)."""
    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tmp_path))
    import cv2

    rdir = tmp_path / "lm_renders_blender" / "renders"
    (rdir / "ape").mkdir(parents=True)
    gt = {}
    for i in range(3):
        cv2.imwrite(str(rdir / "ape" / f"{i}.jpg"),
                    np.zeros((480, 640, 3), np.uint8))
        depth = np.zeros((480, 640), np.uint16)
        depth[50:70, 80:100] = 900
        cv2.imwrite(str(rdir / "ape" / f"{i}_depth_opengl.png"), depth)
        cv2.imwrite(str(rdir / "ape" / f"{i}_mask_opengl.png"),
                    (depth > 0).astype(np.uint8) * 255)
        gt[str(i)] = [{"cam_R_m2c": np.eye(3).flatten().tolist(),
                       "cam_t_m2c": [10.0, 20.0, 900.0],
                       "bbox_visib": [80, 50, 20, 20],
                       "visib_fract": 1.0}]
    (rdir / "ape_gt.json").write_text(json.dumps(gt))

    from rdpn6d_tpu.data.bop import get_split
    get_split("lm_blender_13_train")  # registered
    recs = build_split_records(
        Split("t_blender", "lm_renders_blender", "renders", objs=("ape",),
              filter_invalid=False))
    assert len(recs) == 3
    r = recs[0]
    assert r["obj_id"] == 1 and r["depth_factor"] == 1000.0
    np.testing.assert_allclose(r["t"], [0.01, 0.02, 0.9], atol=1e-6)
    assert r["mask_visib_path"].endswith("0_mask_opengl.png")
    assert r["xyz_path"].endswith("0_xyz_bop.pkl")

    # decoder end-to-end: mask file + depth-derived xyz fallback
    from rdpn6d_tpu.config import Config
    from rdpn6d_tpu.data.assets import synthetic_class_assets
    from rdpn6d_tpu.data.loader import RecordDecoder

    cfg = Config().apply_opts(["head.num_regions=4"])
    sample = RecordDecoder(cfg, synthetic_class_assets(num_regions=4),
                           num_pm_points=16)(r)
    assert sample["mask_visib"].sum() == 20 * 20


def test_mp6d_index_file_protocol(tmp_path, monkeypatch):
    """MP6D train/test index lists: data/0000/000000 real lines and
    data_syn_{1,2}/000000 flat synthetic lines mapped to scenes 78/79
    (reference mp6d.py:117-131)."""
    import cv2
    from scipy.io import savemat

    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tmp_path))
    root = tmp_path / "mp6d"
    K = np.array([[567.5, 0, 312.7], [0, 569.4, 257.2], [0, 0, 1]])

    def write_im(base, t_m):
        os.makedirs(os.path.dirname(base), exist_ok=True)
        cv2.imwrite(base + "-color.png", np.zeros((4, 4, 3), np.uint8))
        cv2.imwrite(base + "-depth.png", np.full((4, 4), 900, np.uint16))
        cv2.imwrite(base + "-label.png", np.zeros((4, 4), np.uint8))
        savemat(base + "-meta.mat", {
            "cls_indexes": np.array([[3]]),
            "poses": np.dstack([np.hstack(
                [np.eye(3), np.array(t_m)[:, None] * 1000.0])]),
            "intrinsic_matrix": K,
            "factor_depth": np.array([[1.0]]),
        })

    write_im(str(root / "data" / "0001" / "000000"), [0.0, 0.0, 0.6])
    write_im(str(root / "data" / "0001" / "000005"), [0.0, 0.0, 0.7])
    write_im(str(root / "data_syn_1" / "000002"), [0.0, 0.0, 0.8])
    (root / "image_set").mkdir()
    (root / "image_set" / "train_data_list.txt").write_text(
        "data/0001/000000\ndata_syn_1/000002\n")

    recs = build_split_records(
        Split("t_mp6d", "mp6d", "data", scene_ids=(1,),
              index_file="image_set/train_data_list.txt"))
    got = sorted((r["scene_id"], r["im_id"]) for r in recs)
    assert got == [(1, 0), (78, 2)]
    # reference units: poses mm -> m, depth raw mm -> factor 1000/1
    for r in recs:
        assert r["depth_factor"] == pytest.approx(1000.0)
    assert recs[0]["t"][2] == pytest.approx(0.6)
    syn = [r for r in recs if r["scene_id"] == 78][0]
    assert syn["t"][2] == pytest.approx(0.8)


def test_mp6d_so_splits_use_index_files(tmp_path, monkeypatch):
    """Per-object MP6D SO splits must follow the same train/test index
    lists as the full splits — NOT glob all scene images (which made SO
    test == SO train; round-2 regression)."""
    import cv2
    from scipy.io import savemat

    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tmp_path))
    root = tmp_path / "mp6d"
    K = np.array([[567.5, 0, 312.7], [0, 569.4, 257.2], [0, 0, 1]])

    def write_im(base, objs):
        os.makedirs(os.path.dirname(base), exist_ok=True)
        cv2.imwrite(base + "-color.png", np.zeros((4, 4, 3), np.uint8))
        cv2.imwrite(base + "-depth.png", np.full((4, 4), 900, np.uint16))
        cv2.imwrite(base + "-label.png", np.zeros((4, 4), np.uint8))
        savemat(base + "-meta.mat", {
            "cls_indexes": np.array([objs]),
            "poses": np.dstack(
                [np.hstack([np.eye(3), np.array([[0.0], [0.0], [600.0]])])
                 for _ in objs]),
            "intrinsic_matrix": K,
            "factor_depth": np.array([[1.0]]),
        })

    # image 0 (train list): objs 3+5; image 5 (test list): obj 3;
    # image 9: in NO list -> must appear nowhere
    write_im(str(root / "data" / "0001" / "000000"), [3, 5])
    write_im(str(root / "data" / "0001" / "000005"), [3])
    write_im(str(root / "data" / "0001" / "000009"), [3])
    (root / "image_set").mkdir()
    (root / "image_set" / "train_data_list.txt").write_text(
        "data/0001/000000\n")
    (root / "image_set" / "test_data_list.txt").write_text(
        "data/0001/000005\n")

    from rdpn6d_tpu.data.bop import get_split

    train = build_split_records(get_split("mp6d_obj_03_train"))
    test = build_split_records(get_split("mp6d_obj_03_test"))
    assert [(r["scene_id"], r["im_id"], r["obj_id"]) for r in train] \
        == [(1, 0, 3)]  # obj 5 filtered out, im 5/9 not in train list
    assert [(r["scene_id"], r["im_id"], r["obj_id"]) for r in test] \
        == [(1, 5, 3)]
    # train and test are disjoint
    assert {(r["scene_id"], r["im_id"]) for r in train}.isdisjoint(
        {(r["scene_id"], r["im_id"]) for r in test})


def test_attach_detections_no_fanout_on_duplicate_instances():
    """Detections are assigned to DISTINCT GT records greedily by bbox IoU
    in descending score order — never one row per (detection x GT instance)
    (round-2 regression: duplicate-instance images produced N_gt x k
    prediction rows), never more rows than the configured top-k, and on
    duplicate-instance images each detection lands on the GT instance it
    overlaps, not whichever record came first."""
    from rdpn6d_tpu.data.detections import attach_detections

    rec = {"scene_id": 1, "im_id": 0, "obj_id": 5, "bbox_mode": "xywh"}
    # GT instance 0 sits at (20..30), instance 1 at (0..10) — record order
    # is the REVERSE of detection score order, so order-zip would misassign
    records = [
        dict(rec, inst_idx=0,
             bbox_visib=np.array([20, 20, 10, 10], np.float32)),
        dict(rec, inst_idx=1,
             bbox_visib=np.array([0, 0, 10, 10], np.float32)),
    ]
    dets = {(1, 0): [
        {"obj_id": 5, "bbox": np.array([0, 0, 10, 10], np.float32),
         "score": 0.9, "time": -1.0},
        {"obj_id": 5, "bbox": np.array([20, 20, 30, 30], np.float32),
         "score": 0.5, "time": -1.0},
    ]}
    out = attach_detections(records, dets, topk_per_obj=2)
    # 2 GT instances + 2 detections -> exactly 2 rows, distinct bboxes
    assert len(out) == 2
    assert sorted(r["det_score"] for r in out) == [0.5, 0.9]
    assert not np.array_equal(out[0]["bbox_visib"], out[1]["bbox_visib"])
    # IoU assignment: the 0.9 det (at 0..10) went to inst_idx=1's record
    by_inst = {r["inst_idx"]: r for r in out}
    assert by_inst[1]["det_score"] == 0.9
    assert by_inst[0]["det_score"] == 0.5

    # configured top-k is respected: 2 GT instances but topk=1 -> 1 row
    out1 = attach_detections(records, dets, topk_per_obj=1)
    assert len(out1) == 1 and out1[0]["det_score"] == 0.9

    # single GT instance: rows capped by available GT records
    out2 = attach_detections([dict(rec, bbox_visib=np.array(
        [0, 0, 10, 10], np.float32))], dets, topk_per_obj=3)
    assert len(out2) == 1 and out2[0]["det_score"] == 0.9


def test_load_detections_missing_bbox_raises(tmp_path):
    import json as _json

    from rdpn6d_tpu.data.detections import load_detections

    p = tmp_path / "dets.json"
    p.write_text(_json.dumps(
        [{"scene_id": 1, "im_id": 0, "obj_id": 5, "score": 0.9}]))
    with pytest.raises(ValueError, match="bbox"):
        load_detections(str(p))
