"""Full eval-path integration: on-disk BOP dataset + PLY models ->
run_eval (records, decoder, device preprocess, eval step, evaluator, CSV).
"""

import json
import os

import numpy as np
import pytest

import rdpn6d_tpu.data.refs as refs_mod
from rdpn6d_tpu.config import Config
from rdpn6d_tpu.data.bop import Split, register_split
from rdpn6d_tpu.data.synthetic import cube_points, render_cube_depth


def write_cube_ply(path, half=0.05):
    """ASCII PLY of a cube (mm units like BOP models)."""
    h = half * 1000.0
    v = [(x, y, z) for x in (-h, h) for y in (-h, h) for z in (-h, h)]
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = [t for a, b, c, d in quads for t in ((a, b, c), (a, c, d))]
    lines = ["ply", "format ascii 1.0", f"element vertex {len(v)}",
             "property float x", "property float y", "property float z",
             f"element face {len(faces)}",
             "property list uchar int vertex_indices", "end_header"]
    lines += [f"{x} {y} {z}" for x, y, z in v]
    lines += [f"3 {a} {b} {c}" for a, b, c in faces]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def full_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("bop_eval")
    ds = root / "lm"
    sdir = ds / "test" / "000001"
    (sdir / "rgb").mkdir(parents=True)
    (sdir / "depth").mkdir()
    (sdir / "mask_visib").mkdir()

    write_cube_ply(str(ds / "models" / "obj_000001.ply"))
    info = {"1": {"diameter": 100 * np.sqrt(3), "size_x": 100.0,
                  "size_y": 100.0, "size_z": 100.0, "min_x": -50.0,
                  "min_y": -50.0, "min_z": -50.0}}
    (ds / "models" / "models_info.json").write_text(json.dumps(info))

    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]])
    scene_gt, scene_cam, scene_info = {}, {}, {}
    rng = np.random.RandomState(3)
    for im_id in range(3):
        R = cv2.Rodrigues(rng.randn(3) * 0.5)[0]
        t = np.array([0.02, -0.01, 0.7])
        depth, xyz = render_cube_depth(R, t, K, 480, 640)
        mask = (depth > 0).astype(np.uint8) * 255
        cv2.imwrite(str(sdir / "rgb" / f"{im_id:06d}.png"),
                    np.dstack([mask] * 3))
        cv2.imwrite(str(sdir / "depth" / f"{im_id:06d}.png"),
                    (depth * 1000).astype(np.uint16))
        cv2.imwrite(str(sdir / "mask_visib" / f"{im_id:06d}_000000.png"),
                    mask)
        ys, xs = np.nonzero(mask)
        scene_gt[str(im_id)] = [{"cam_R_m2c": R.flatten().tolist(),
                                 "cam_t_m2c": (t * 1000).tolist(),
                                 "obj_id": 1}]
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


def test_run_eval_full_path(full_dataset, monkeypatch, tmp_path):
    monkeypatch.setattr(refs_mod, "DATA_ROOT", full_dataset)
    register_split(Split("tiny_eval_test", "lm", "test", scene_ids=(1,)))

    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16",
        f'train.output_dir="{tmp_path}"',
    ])

    import jax.numpy as jnp

    from rdpn6d_tpu.engine.eval_runner import run_eval
    from rdpn6d_tpu.models import RDPN

    # random-init model: accuracy is irrelevant; the path must run
    model = RDPN(cfg, dtype=jnp.float32)
    result = run_eval(cfg, ckpt_dir=str(tmp_path / "nockpt"),
                      allow_random_init=True,
                      split_name="tiny_eval_test", batch_size=2,
                      model=model,
                      csv_path=str(tmp_path / "out.csv"))
    assert result["stats"]["n_rois"] >= 0
    assert "ape" in result["per_obj"]  # obj_id 1 in the lm ref is "ape"
    rec = result["per_obj"]["ape"]
    assert 0.0 <= rec["ad_10"] <= 100.0
    # CSV written with 3 rows
    csv = (tmp_path / "out.csv").read_text().strip().splitlines()
    assert len(csv) == 4  # header + 3 estimates


def test_run_eval_bop19_targets(full_dataset, monkeypatch, tmp_path):
    """Target filtering restricts scoring to the target list, and
    mssd/mspd error types produce the BOP19 AR block."""
    monkeypatch.setattr(refs_mod, "DATA_ROOT", full_dataset)
    targets = [{"scene_id": 1, "im_id": 0, "obj_id": 1, "inst_count": 1},
               {"scene_id": 1, "im_id": 2, "obj_id": 1, "inst_count": 1}]
    tpath = os.path.join(full_dataset, "lm", "targets_tiny.json")
    with open(tpath, "w") as f:
        json.dump(targets, f)
    register_split(Split("tiny_eval_tgt", "lm", "test", scene_ids=(1,),
                         filter_invalid=False,
                         targets_file="targets_tiny.json"))

    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16",
        'test.error_types="ad,mssd,mspd,vsd"',
        f'train.output_dir="{tmp_path}"',
    ])

    import jax.numpy as jnp

    from rdpn6d_tpu.engine.eval_runner import run_eval
    from rdpn6d_tpu.models import RDPN

    model = RDPN(cfg, dtype=jnp.float32)
    result = run_eval(cfg, ckpt_dir=str(tmp_path / "nockpt"),
                      allow_random_init=True,
                      split_name="tiny_eval_tgt", batch_size=2,
                      model=model, csv_path=str(tmp_path / "tgt.csv"))
    # only 2 of the 3 scene images are targets
    csv = (tmp_path / "tgt.csv").read_text().strip().splitlines()
    assert len(csv) == 3  # header + 2 estimates
    assert {int(r.split(",")[1]) for r in csv[1:]} == {0, 2}
    assert "bop19" in result
    b = result["bop19"]
    assert set(b) >= {"AR_mssd", "AR_mspd", "AR"}
    for v in b.values():
        assert 0.0 <= v <= 1.0
    # cube ply has faces -> the vsd path (rasterizer-backed) must engage
    assert "AR_vsd" in b


def test_run_eval_est_dets_from_config(full_dataset, monkeypatch, tmp_path):
    """test.test_bbox_type=est + data.det_files_test drive est-bbox eval
    from the config alone (reference DATASETS.DET_FILES_TEST)."""
    monkeypatch.setattr(refs_mod, "DATA_ROOT", full_dataset)
    from rdpn6d_tpu.data.detections import load_detections

    # detections only for im 0 and 1 -> im 2's GT still counts in recalls
    dets = [
        {"scene_id": 1, "im_id": 0, "obj_id": 1, "score": 0.9,
         "bbox_est": [200, 150, 200, 180]},
        {"scene_id": 1, "im_id": 1, "obj_id": 1, "score": 0.8,
         "bbox_est": [210, 140, 190, 190]},
    ]
    dpath = tmp_path / "dets.json"
    dpath.write_text(json.dumps(dets))
    assert len(load_detections(str(dpath))) == 2

    register_split(Split("tiny_eval_det", "lm", "test", scene_ids=(1,),
                         filter_invalid=False))
    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16",
        'test.test_bbox_type="est"',
        f'data.det_files_test=["{dpath}"]',
        'data.test_datasets=["tiny_eval_det"]',
        f'train.output_dir="{tmp_path}"',
    ])

    import jax.numpy as jnp

    from rdpn6d_tpu.engine.eval_runner import run_eval
    from rdpn6d_tpu.models import RDPN

    model = RDPN(cfg, dtype=jnp.float32)
    result = run_eval(cfg, ckpt_dir=str(tmp_path / "nockpt"),
                      allow_random_init=True,
                      split_name="tiny_eval_det", batch_size=2,
                      model=model, csv_path=str(tmp_path / "det.csv"))
    csv = (tmp_path / "det.csv").read_text().strip().splitlines()
    assert len(csv) == 3  # only the 2 detected instances predicted
    # random model + missing det: every metric must use denominator 3 (GTs)
    # -> values are multiples of 100/3
    rec = result["per_obj"]["ape"]
    assert any(abs(rec["ad_10"] - v) < 1e-6
               for v in (0.0, 100 / 3, 200 / 3, 100.0))


def test_run_eval_mp6d_ycb_style(tmp_path, monkeypatch):
    """YCB-style (MP6D) eval: bboxes must be derived from the -label.png
    class-id images (there is no scene_gt_info/mask_visib tree), and the
    grouped eval path must produce predictions rather than skipping every
    instance (round-2 regression)."""
    import cv2
    from scipy.io import savemat

    root = tmp_path / "bopy"
    sdir = root / "mp6d" / "data" / "0001"
    sdir.mkdir(parents=True)
    mdir = root / "mp6d" / "models"
    write_cube_ply(str(mdir / "obj_000003.ply"))
    info = {"3": {"diameter": 100 * np.sqrt(3), "size_x": 100.0,
                  "size_y": 100.0, "size_z": 100.0}}
    (mdir / "models_info.json").write_text(json.dumps(info))

    K = np.array([[567.5, 0, 312.7], [0, 569.4, 257.2], [0, 0, 1]])
    rng = np.random.RandomState(5)
    for im_id in range(2):
        R = cv2.Rodrigues(rng.randn(3) * 0.4)[0]
        t = np.array([0.01, 0.02, 0.6])
        depth, _ = render_cube_depth(R.astype(np.float32),
                                     t.astype(np.float32),
                                     K.astype(np.float32), 480, 640)
        label = (depth > 0).astype(np.uint8) * 3
        cv2.imwrite(str(sdir / f"{im_id:06d}-color.png"),
                    np.dstack([label * 80] * 3))
        cv2.imwrite(str(sdir / f"{im_id:06d}-depth.png"),
                    (depth * 1000).astype(np.uint16))
        cv2.imwrite(str(sdir / f"{im_id:06d}-label.png"), label)
        savemat(str(sdir / f"{im_id:06d}-meta.mat"), {
            "cls_indexes": np.array([[3]]),
            "poses": np.dstack([np.hstack([R, t[:, None] * 1000.0])]),
            "intrinsic_matrix": K,
            "factor_depth": np.array([[1.0]]),
        })

    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(root))
    register_split(Split("mp6d_tiny_eval", "mp6d", "data", scene_ids=(1,),
                         filter_invalid=False))

    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16",
        'test.error_types="ad,adi,AUCad,re,te"',
        f'train.output_dir="{tmp_path}"',
    ])

    import jax.numpy as jnp

    from rdpn6d_tpu.engine.eval_runner import run_eval
    from rdpn6d_tpu.models import RDPN

    model = RDPN(cfg, dtype=jnp.float32)
    result = run_eval(cfg, ckpt_dir=str(tmp_path / "nockpt"),
                      allow_random_init=True,
                      split_name="mp6d_tiny_eval", batch_size=2,
                      model=model, csv_path=str(tmp_path / "mp6d.csv"))
    # both instances must have been evaluated, not skipped
    assert result["stats"]["n_rois"] == 2
    assert "obj_03" in result["per_obj"]
    csv = (tmp_path / "mp6d.csv").read_text().strip().splitlines()
    assert len(csv) == 3  # header + 2 estimates


def test_score_csv_rescores_run_eval_output(full_dataset, monkeypatch,
                                            tmp_path, capsys):
    """tools/score_csv must reproduce run_eval's protocol on the cached
    CSV: eval meshes, n_gts failure padding, per-instance matching."""
    import sys

    monkeypatch.setattr(refs_mod, "DATA_ROOT", full_dataset)
    register_split(Split("tiny_rescore", "lm", "test", scene_ids=(1,)))
    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16",
        f'train.output_dir="{tmp_path}"',
    ])
    import jax.numpy as jnp

    from rdpn6d_tpu.engine.eval_runner import run_eval
    from rdpn6d_tpu.models import RDPN

    csv_path = str(tmp_path / "rescore.csv")
    run_eval(cfg, ckpt_dir=str(tmp_path / "nockpt"),
             allow_random_init=True, split_name="tiny_rescore",
             batch_size=2, model=RDPN(cfg, dtype=jnp.float32),
             csv_path=csv_path)

    sys.path.insert(0, "tools")
    import importlib

    score_csv = importlib.import_module("score_csv")
    monkeypatch.setattr(sys, "argv",
                        ["score_csv", "--csv", csv_path,
                         "--split", "tiny_rescore", "--num-regions", "4"])
    score_csv.main()
    out = capsys.readouterr().out
    assert "ape" in out and "MEAN" in out


def test_run_eval_multi_instance_frames_split_across_batches(
        tmp_path, monkeypatch):
    """Images with several instances + a batch size that forces one
    image's ROIs to span two batches: frame dedup, flush logic, and
    per-instance scoring must all hold (n_rois == total instances)."""
    import cv2

    root = tmp_path / "bop_multi"
    ds = root / "lm"
    sdir = ds / "test" / "000001"
    (sdir / "rgb").mkdir(parents=True)
    (sdir / "depth").mkdir()
    (sdir / "mask_visib").mkdir()
    for oid in (1, 5):  # ape + can
        write_cube_ply(str(ds / "models" / f"obj_{oid:06d}.ply"))
    info = {str(oid): {"diameter": 100 * np.sqrt(3), "size_x": 100.0,
                       "size_y": 100.0, "size_z": 100.0}
            for oid in (1, 5)}
    (ds / "models" / "models_info.json").write_text(json.dumps(info))

    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]])
    rng = np.random.RandomState(7)
    scene_gt, scene_cam, scene_info = {}, {}, {}
    for im_id in range(3):  # 3 images x 2 instances = 6 ROIs
        gts, infos = [], []
        depth_full = np.zeros((480, 640), np.float32)
        for k, oid in enumerate((1, 5)):
            R = cv2.Rodrigues(rng.randn(3) * 0.5)[0]
            t = np.array([-0.08 + 0.16 * k, 0.0, 0.7])
            depth, _ = render_cube_depth(R, t, K, 480, 640)
            m = depth > 0
            depth_full = np.where(m & ((depth_full == 0)
                                       | (depth < depth_full)),
                                  depth, depth_full)
            cv2.imwrite(str(sdir / "mask_visib"
                            / f"{im_id:06d}_{k:06d}.png"),
                        m.astype(np.uint8) * 255)
            ys, xs = np.nonzero(m)
            gts.append({"cam_R_m2c": R.flatten().tolist(),
                        "cam_t_m2c": (t * 1000).tolist(),
                        "obj_id": oid})
            infos.append({"bbox_visib": [int(xs.min()), int(ys.min()),
                                         int(xs.max() - xs.min()),
                                         int(ys.max() - ys.min())],
                          "visib_fract": 1.0})
        mask_im = (depth_full > 0).astype(np.uint8) * 255
        cv2.imwrite(str(sdir / "rgb" / f"{im_id:06d}.png"),
                    np.dstack([mask_im] * 3))
        cv2.imwrite(str(sdir / "depth" / f"{im_id:06d}.png"),
                    (depth_full * 1000).astype(np.uint16))
        scene_gt[str(im_id)] = gts
        scene_cam[str(im_id)] = {"cam_K": K.flatten().tolist(),
                                 "depth_scale": 1.0}
        scene_info[str(im_id)] = infos
    (sdir / "scene_gt.json").write_text(json.dumps(scene_gt))
    (sdir / "scene_camera.json").write_text(json.dumps(scene_cam))
    (sdir / "scene_gt_info.json").write_text(json.dumps(scene_info))

    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(root))
    register_split(Split("multi_inst_eval", "lm", "test", scene_ids=(1,),
                         filter_invalid=False))
    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16",
        f'train.output_dir="{tmp_path}"',
    ])
    import jax.numpy as jnp

    from rdpn6d_tpu.engine.eval_runner import run_eval
    from rdpn6d_tpu.models import RDPN

    # batch_size=3 with 2 instances/frame: the second image's ROIs span
    # batch boundaries
    result = run_eval(cfg, ckpt_dir=str(tmp_path / "nockpt"),
                      allow_random_init=True,
                      split_name="multi_inst_eval", batch_size=3,
                      model=RDPN(cfg, dtype=jnp.float32),
                      csv_path=str(tmp_path / "multi.csv"))
    assert result["stats"]["n_rois"] == 6
    assert set(result["per_obj"]) == {"ape", "can"}
    csv = (tmp_path / "multi.csv").read_text().strip().splitlines()
    assert len(csv) == 7  # header + 6 rows
    # BOP toolkit contract: ONE time value per (scene, image)
    import collections
    times = collections.defaultdict(set)
    for ln in csv[1:]:
        f = ln.split(",")
        times[(f[0], f[1])].add(f[-1])
    assert all(len(v) == 1 for v in times.values()), times


def test_run_eval_int8_static(full_dataset, monkeypatch, tmp_path):
    """test.int8 + test.int8_static: run_eval calibrates activation
    scales on the first eval batch and serves static int8."""
    monkeypatch.setattr(refs_mod, "DATA_ROOT", full_dataset)
    register_split(Split("tiny_eval_q", "lm", "test", scene_ids=(1,)))

    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16",
        'test.int8="head"', "test.int8_static=true",
        f'train.output_dir="{tmp_path}"',
    ])

    import jax.numpy as jnp

    from rdpn6d_tpu.engine.eval_runner import run_eval
    from rdpn6d_tpu.models import RDPN

    model = RDPN(cfg, dtype=jnp.float32, int8="head", int8_static=True)
    result = run_eval(cfg, ckpt_dir=str(tmp_path / "nockpt"),
                      allow_random_init=True,
                      split_name="tiny_eval_q", batch_size=2,
                      model=model,
                      csv_path=str(tmp_path / "q.csv"))
    assert result["stats"]["n_rois"] >= 3
    rec = result["per_obj"]["ape"]
    assert 0.0 <= rec["ad_10"] <= 100.0
    csv = (tmp_path / "q.csv").read_text().strip().splitlines()
    assert len(csv) == 4


def test_bop19_targets_filtered_by_split_objs(full_dataset, monkeypatch,
                                              tmp_path):
    """An object-subset split (SO protocol, e.g. lm_mini_<obj>_*) must
    score ONLY its objects' BOP19 targets — other objects' targets in a
    shared targets file would otherwise count as unmatched misses."""
    monkeypatch.setattr(refs_mod, "DATA_ROOT", full_dataset)
    targets = [
        {"scene_id": 1, "im_id": 0, "obj_id": 1, "inst_count": 1},
        {"scene_id": 1, "im_id": 2, "obj_id": 1, "inst_count": 1},
        # benchvise: present in the shared targets file, NOT in the split
        {"scene_id": 1, "im_id": 0, "obj_id": 2, "inst_count": 1},
    ]
    tpath = os.path.join(full_dataset, "lm", "targets_so.json")
    with open(tpath, "w") as f:
        json.dump(targets, f)
    register_split(Split("tiny_eval_so", "lm", "test", scene_ids=(1,),
                         objs=("ape",), filter_invalid=False,
                         targets_file="targets_so.json"))

    from rdpn6d_tpu.data.bop import get_split
    from rdpn6d_tpu.data.refs import get_ref
    from rdpn6d_tpu.engine.eval_runner import _eval_setup

    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16",
        f'train.output_dir="{tmp_path}"',
    ])
    split = get_split("tiny_eval_so")
    _, tgts, n_gts, _, _, _, _ = _eval_setup(
        cfg, "tiny_eval_so", split, get_ref(split.ref_name), None)
    assert len(tgts) == 2 and all(t["obj_id"] == 1 for t in tgts), tgts
