"""Frame-deduplicated compact-dtype TRAIN input path (VERDICT r2 #1).

The grouped path ships uint8 RGB / raw uint16 depth once per FRAME and
per-ROI GT in compact dtypes (f16 xyz or device-derived, packed uint8
masks). These tests pin label-identity against the flat per-ROI float32
path on a multi-instance fixture, the >=4x step-input-bytes cut, and the
end-to-end iterator/CLI wiring.
"""

import json

import numpy as np
import pytest

import rdpn6d_tpu.data.refs as refs_mod
from rdpn6d_tpu.config import Config
from rdpn6d_tpu.data.assets import synthetic_class_assets
from rdpn6d_tpu.data.loader import RecordDecoder, _stack
from rdpn6d_tpu.data.synthetic import render_cube_depth


N_INST = 4  # YCB-V-like instance density (~5/frame in the real set)


@pytest.fixture(scope="module")
def multi_instance_ds(tmp_path_factory):
    """2 frames x 4 cube instances (disjoint in image space), BOP layout.

    Returns (root, records): flattened per-instance records exactly as
    build_split_records emits them.
    """
    import cv2

    root = tmp_path_factory.mktemp("mi_bop")
    sdir = root / "lm" / "train" / "000001"
    (sdir / "rgb").mkdir(parents=True)
    (sdir / "depth").mkdir()
    (sdir / "mask_visib").mkdir()

    # models dir for asset loading (CLI path builds its own decoder)
    from tests.test_eval_runner import write_cube_ply

    mdir = root / "lm" / "models"
    write_cube_ply(str(mdir / "obj_000001.ply"))
    (mdir / "models_info.json").write_text(json.dumps(
        {"1": {"diameter": 173.2, "size_x": 100.0, "size_y": 100.0,
               "size_z": 100.0}}))

    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]])
    rng = np.random.RandomState(0)
    scene_gt, scene_cam, scene_info = {}, {}, {}
    for im_id in range(2):
        depth_full = np.zeros((480, 640), np.float32)
        rgb = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
        gts, infos = [], []
        for inst in range(N_INST):
            R = cv2.Rodrigues(rng.randn(3) * 0.5)[0]
            # spread instances left/right so masks are disjoint
            t = np.array([-0.21 + 0.14 * inst,
                          -0.05 + 0.1 * (inst % 2), 1.0])
            d, _ = render_cube_depth(R, t, K, 480, 640)
            mask = (d > 0)
            depth_full = np.where(mask, d, depth_full)
            cv2.imwrite(
                str(sdir / "mask_visib" / f"{im_id:06d}_{inst:06d}.png"),
                mask.astype(np.uint8) * 255)
            ys, xs = np.nonzero(mask)
            gts.append({"cam_R_m2c": R.flatten().tolist(),
                        "cam_t_m2c": (t * 1000).tolist(), "obj_id": 1})
            infos.append({"bbox_visib": [int(xs.min()), int(ys.min()),
                                         int(xs.max() - xs.min()),
                                         int(ys.max() - ys.min())],
                          "visib_fract": 1.0})
        cv2.imwrite(str(sdir / "rgb" / f"{im_id:06d}.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(sdir / "depth" / f"{im_id:06d}.png"),
                    (depth_full * 1000).astype(np.uint16))
        scene_gt[str(im_id)] = gts
        scene_cam[str(im_id)] = {"cam_K": K.flatten().tolist(),
                                 "depth_scale": 1.0}
        scene_info[str(im_id)] = infos
    (sdir / "scene_gt.json").write_text(json.dumps(scene_gt))
    (sdir / "scene_camera.json").write_text(json.dumps(scene_cam))
    (sdir / "scene_gt_info.json").write_text(json.dumps(scene_info))

    from rdpn6d_tpu.data.bop import Split, build_split_records

    import unittest.mock as mock
    with mock.patch.object(refs_mod, "DATA_ROOT", str(root)):
        records = build_split_records(
            Split("mi_train", "lm", "train", scene_ids=(1,)), flatten=True)
    assert len(records) == 2 * N_INST
    return str(root), records


def _flat_and_grouped(cfg, records, ship_xyz):
    """Run both input paths over the SAME records with the SAME key."""
    import jax
    import jax.numpy as jnp

    from rdpn6d_tpu.data.pipeline import (preprocess_batch,
                                          preprocess_rois_grouped)

    assets = synthetic_class_assets(num_regions=4)
    dec = RecordDecoder(cfg, assets, num_pm_points=64)

    flat = _stack([dec(r) for r in records])
    key = jax.random.PRNGKey(42)
    out_flat = preprocess_batch(
        cfg, {k: jnp.asarray(v) for k, v in flat.items()}, key, train=True)

    frames_l, rois_l, fmap = [], [], {}
    for r in records:
        fkey = (r["scene_id"], r["im_id"])
        if fkey not in fmap:
            fmap[fkey] = len(frames_l)
            frames_l.append(dec.read_frame(r))
        roi, private = dec.decode_roi_compact(r, frames_l[fmap[fkey]],
                                              ship_xyz=ship_xyz)
        assert private is None  # no bg aug in this cfg
        roi["frame_idx"] = np.int32(fmap[fkey])
        rois_l.append(roi)
    from rdpn6d_tpu.data.loader import _pad_roi_crops
    _pad_roi_crops(rois_l, int(cfg.data.crop_pad))  # as the iterator does
    frames = {k: jnp.asarray(v) for k, v in _stack(frames_l).items()}
    rois = {k: jnp.asarray(v) for k, v in _stack(rois_l).items()}
    out_grp = preprocess_rois_grouped(cfg, frames, rois, key, train=True)
    return out_flat, out_grp, flat, (frames_l, rois_l)


@pytest.mark.parametrize("ship_xyz", [True, False],
                         ids=["f16_xyz", "device_derived_xyz"])
def test_grouped_labels_match_flat_path(multi_instance_ds, ship_xyz):
    """Grouped compact batches are label-identical to the per-ROI float32
    path (same PRNG stream -> same DZI crops) within compact-dtype
    tolerance."""
    _, records = multi_instance_ds
    cfg = Config().apply_opts(["head.num_regions=4"])
    out_flat, out_grp, _, _ = _flat_and_grouped(cfg, records, ship_xyz)

    exact = ["roi_mask_visib", "roi_mask_obj", "roi_mask_trunc",
             "roi_region"]
    close = {"roi_img": 2e-3, "roi_coord_2d": 1e-4, "roi_xyz": 2e-3,
             "trans_ratio": 1e-5, "gt_allo_rot6d": 1e-5,
             "bbox_center": 1e-4, "scale": 1e-3, "resize_ratio": 1e-6}
    for k in exact:
        a, b = np.asarray(out_flat[k]), np.asarray(out_grp[k])
        # f16 xyz quantization can flip region/mask at object boundaries
        # on a handful of pixels; the maps must agree essentially
        # everywhere
        frac = np.mean(a != b)
        assert frac < 5e-3, (k, frac)
    for k, atol in close.items():
        a, b = np.asarray(out_flat[k]), np.asarray(out_grp[k])
        # compare off the (rare) boundary-flip pixels for map tensors
        if a.ndim >= 3 and a.shape[1:3] == (64, 64):
            agree = (np.asarray(out_flat["roi_mask_obj"])
                     == np.asarray(out_grp["roi_mask_obj"]))
            if a.ndim == 4:
                agree = agree[..., None]
            diff = np.abs(a - b) * agree
        else:
            diff = np.abs(a - b)
        assert diff.max() < atol + 1e-7, (k, float(diff.max()))


@pytest.mark.parametrize("ship_xyz", [True, False],
                         ids=["f16_xyz", "device_derived_xyz"])
def test_ship_crops_bit_identical_to_full_frames(multi_instance_ds,
                                                 ship_xyz):
    """data.ship_crops (GT xyz + packed masks as the xyz nonzero bbox +
    offset) must be BIT-identical to full-frame GT shipping: everything
    the train graph consumes is zero outside that bbox, and out-of-crop
    warp taps read zero like the full frame's zeros."""
    import jax
    import jax.numpy as jnp

    from rdpn6d_tpu.data.loader import _pad_roi_crops
    from rdpn6d_tpu.data.pipeline import preprocess_rois_grouped

    _, records = multi_instance_ds
    key = jax.random.PRNGKey(7)
    outs = {}
    for ship_crops in (False, True):
        cfg = Config().apply_opts(["head.num_regions=4",
                                   f"data.ship_crops={ship_crops}"])
        assert cfg.data.ship_crops is ship_crops  # apply_opts bool coercion
        assets = synthetic_class_assets(num_regions=4)
        dec = RecordDecoder(cfg, assets, num_pm_points=64)
        frames_l, rois_l, fmap = [], [], {}
        for r in records:
            fkey = (r["scene_id"], r["im_id"])
            if fkey not in fmap:
                fmap[fkey] = len(frames_l)
                frames_l.append(dec.read_frame(r))
            roi, _ = dec.decode_roi_compact(r, frames_l[fmap[fkey]],
                                            ship_xyz=ship_xyz)
            roi["frame_idx"] = np.int32(fmap[fkey])
            rois_l.append(roi)
        if ship_crops and ship_xyz:
            assert all("xyz_offset" in r for r in rois_l)
            assert all(r["xyz"].shape[:2] != (480, 640) for r in rois_l)
            _pad_roi_crops(rois_l, 64)
            sides = {r["xyz"].shape[:2] for r in rois_l}
            assert len(sides) == 1 and len(rois_l[0]["mask_packed"].shape) == 2
        frames = {k: jnp.asarray(v) for k, v in _stack(frames_l).items()}
        rois = {k: jnp.asarray(v) for k, v in _stack(rois_l).items()}
        outs[ship_crops] = preprocess_rois_grouped(cfg, frames, rois, key,
                                                   train=True)
    for k in outs[False]:
        a, b = np.asarray(outs[False][k]), np.asarray(outs[True][k])
        np.testing.assert_array_equal(a, b, err_msg=k)


def test_grouped_step_input_bytes_cut(multi_instance_ds):
    """>=4x less host->device traffic than the flat path on a 2-instance
    fixture (VERDICT r2 #1 done-criterion); ~10x when coords are derived
    on device."""
    _, records = multi_instance_ds
    cfg = Config().apply_opts(["head.num_regions=4"])

    def nbytes(d):
        return sum(np.asarray(v).nbytes for v in d.values())

    _, _, flat, (frames_l, rois_l) = _flat_and_grouped(cfg, records, True)
    flat_b = nbytes(flat)
    grp_b = sum(nbytes(f) for f in frames_l) + sum(
        nbytes(r) for r in rois_l)
    assert flat_b / grp_b >= 4.0, (flat_b, grp_b)

    _, _, _, (frames_l, rois_l) = _flat_and_grouped(cfg, records, False)
    grp_b = sum(nbytes(f) for f in frames_l) + sum(
        nbytes(r) for r in rois_l)
    assert flat_b / grp_b >= 12.0, (flat_b, grp_b)


def test_group_iterator_dedup_and_dtypes(multi_instance_ds, monkeypatch):
    """train_group_iterator yields compact frame-deduplicated batches."""
    root, _ = multi_instance_ds
    monkeypatch.setattr(refs_mod, "DATA_ROOT", root)
    from rdpn6d_tpu.data.bop import Split, register_split
    from rdpn6d_tpu.data.loader import train_group_iterator

    register_split(Split("mi_train_grp", "lm", "train", scene_ids=(1,)))
    cfg = Config().apply_opts(["head.num_regions=4"])
    assets = synthetic_class_assets(num_regions=4)
    dec = RecordDecoder(cfg, assets, num_pm_points=64)
    it = train_group_iterator(cfg, "mi_train_grp", decoder=dec,
                              batch_size=2 * N_INST, frame_bucket=1)
    batch = next(it)
    frames, rois = batch["frames"], batch["rois"]
    assert frames["rgb"].dtype == np.uint8
    assert frames["depth_raw"].dtype == np.uint16
    assert rois["mask_packed"].dtype == np.uint8
    assert rois["frame_idx"].shape == (2 * N_INST,)
    # 8 ROIs share 2 frames — the frame axis is DEDUPLICATED
    assert frames["rgb"].shape[0] == 2
    assert set(np.asarray(rois["frame_idx"]).tolist()) == {0, 1}
    # no xyz files on disk -> coords derived on device, nothing shipped
    assert "xyz" not in rois

    # determinism across worker counts (order-preserving pool)
    it1 = train_group_iterator(cfg, "mi_train_grp", decoder=dec,
                               batch_size=2 * N_INST, seed=5,
                               num_workers=1, frame_bucket=1)
    it8 = train_group_iterator(cfg, "mi_train_grp", decoder=dec,
                               batch_size=2 * N_INST, seed=5,
                               num_workers=8, frame_bucket=1)
    for _ in range(2):
        b1, b8 = next(it1), next(it8)
        np.testing.assert_array_equal(b1["frames"]["rgb"],
                                      b8["frames"]["rgb"])
        np.testing.assert_array_equal(b1["rois"]["bbox"],
                                      b8["rois"]["bbox"])


def test_frame_repeat_factors_image_level_semantics():
    """Reference-exact image-level repeat factors
    (my_distributed_sampler.py:88-131): f(c) = fraction of FRAMES
    containing c; r(c) = max(1, sqrt(thr/f(c))); r(frame) = max over its
    categories."""
    import math

    from rdpn6d_tpu.data.sampler import (RepeatFactorSampler,
                                         frame_repeat_factors)

    # 4 frames: class 0 in all (f=1.0), class 1 in one frame (f=0.25)
    frames = [[0], [0, 0], [0], [0, 1]]
    reps = frame_repeat_factors(frames, repeat_thresh=0.5)
    np.testing.assert_allclose(reps[:3], 1.0)
    np.testing.assert_allclose(reps[3], math.sqrt(0.5 / 0.25))

    # the sampler oversamples the rare frame by ~r in expectation
    s = RepeatFactorSampler(repeat_factors=reps, seed=3)
    import itertools

    draws = list(itertools.islice(iter(s), 5000))
    counts = np.bincount(draws, minlength=4)
    ratio = counts[3] / counts[:3].mean()
    assert 1.2 <= ratio <= 1.7  # sqrt(2) ~ 1.414 in expectation


def test_group_iterator_frame_level_repeat_factor(multi_instance_ds,
                                                  monkeypatch):
    """repeat_factor_thresh>0 now runs on the grouped path (frame-level
    factors); single-class fixture -> factors all 1.0, batches flow."""
    root, _ = multi_instance_ds
    monkeypatch.setattr(refs_mod, "DATA_ROOT", root)
    from rdpn6d_tpu.data.bop import Split, register_split
    from rdpn6d_tpu.data.loader import train_group_iterator

    register_split(Split("mi_train_grp", "lm", "train", scene_ids=(1,)))
    cfg = Config().apply_opts(["head.num_regions=4",
                               "data.repeat_factor_thresh=0.5"])
    assets = synthetic_class_assets(num_regions=4)
    dec = RecordDecoder(cfg, assets)
    it = train_group_iterator(cfg, "mi_train_grp", decoder=dec,
                              batch_size=4, frame_bucket=1)
    batch = next(it)
    assert batch["rois"]["bbox"].shape[0] == 4


def test_cli_train_grouped(multi_instance_ds, monkeypatch, tmp_path):
    """python -m rdpn6d_tpu.main with data.grouped_train=True: the full
    wiring (iterator -> grouped preprocessing -> sharded train step)."""
    import textwrap

    root, _ = multi_instance_ds
    monkeypatch.setattr(refs_mod, "DATA_ROOT", root)
    from rdpn6d_tpu.data.bop import Split, register_split
    register_split(Split("mi_train_cli", "lm", "train",
                         scene_ids=(1,), objs=("ape",)))

    out_dir = str(tmp_path / "out").replace("\\", "/")
    cfg_path = tmp_path / "cfg_grouped.py"
    cfg_path.write_text(textwrap.dedent(f"""
        from rdpn6d_tpu.config import Config

        def get_config():
            return Config().apply_opts([
                "backbone.depth=18", "backbone.input_res=64",
                "head.out_res=16", "head.num_regions=4",
                "head.num_filters=32", "data.input_res=64",
                "data.out_res=16", "loss.num_pm_points=64",
                'data.train_datasets=["mi_train_cli"]',
                "data.grouped_train=True", "data.frame_bucket=1",
                "solver.ims_per_batch=8", "solver.total_epochs=1",
                "solver.optimizer=adamw", "solver.warmup_iters=1",
                "train.log_period=1",
                'train.output_dir="{out_dir}"',
            ])
    """))
    from rdpn6d_tpu.main import main

    main(["--config-file", str(cfg_path)])
    import os
    assert os.path.isdir(os.path.join(out_dir, "ckpt"))
    metrics = open(os.path.join(out_dir, "metrics.json")).read().strip()
    assert "total_loss" in metrics


def test_device_frame_cache_bit_identical_and_bounded(multi_instance_ds,
                                                      monkeypatch):
    """Device-resident frame LRU (data/device_cache.py): identical
    batches to the streaming path, hits after warmup, byte cap held."""
    root, _ = multi_instance_ds
    monkeypatch.setattr(refs_mod, "DATA_ROOT", root)
    from rdpn6d_tpu.data.bop import Split, register_split
    from rdpn6d_tpu.data.device_cache import DeviceFrameCache
    from rdpn6d_tpu.data.loader import train_group_iterator

    register_split(Split("mi_train_devc", "lm", "train", scene_ids=(1,)))
    cfg = Config().apply_opts(["head.num_regions=4"])
    assets = synthetic_class_assets(num_regions=4)
    dec = RecordDecoder(cfg, assets, num_pm_points=64)

    kw = dict(decoder=dec, batch_size=2 * N_INST, seed=3, frame_bucket=1)
    it_stream = train_group_iterator(cfg, "mi_train_devc", **kw)
    it_keys = train_group_iterator(cfg, "mi_train_devc", yield_keys=True,
                                   **kw)
    cache = DeviceFrameCache(64 << 20)
    for step in range(3):
        bs_ = next(it_stream)
        bk = next(it_keys)
        stacked = cache.stack(bk["frame_slots"])
        for k in bs_["frames"]:
            np.testing.assert_array_equal(
                np.asarray(stacked[k]), bs_["frames"][k])
        np.testing.assert_array_equal(np.asarray(bk["rois"]["bbox"]),
                                      bs_["rois"]["bbox"])
    # only 2 distinct frames exist: everything after step 0 must hit
    assert cache.hits > 0 and len(cache) == 2
    assert cache.misses == 2

    # byte cap: a cap of ~1 frame keeps at most one resident
    one_frame = cache.resident_bytes // 2
    small = DeviceFrameCache(one_frame + 1)
    for _ in range(2):
        small.stack(next(it_keys)["frame_slots"])
    assert small.resident_bytes <= one_frame + 1
    assert len(small) <= 1


def test_device_frame_cache_private_frames_stream(multi_instance_ds,
                                                  monkeypatch, tmp_path):
    """bg-replaced private frames carry key=None and never enter the
    cache — per-visit pixels must not be pinned."""
    import cv2

    root, _ = multi_instance_ds
    monkeypatch.setattr(refs_mod, "DATA_ROOT", root)
    from rdpn6d_tpu.data.bop import Split, register_split
    from rdpn6d_tpu.data.device_cache import DeviceFrameCache
    from rdpn6d_tpu.data.loader import train_group_iterator

    bg_dir = tmp_path / "bg"
    bg_dir.mkdir()
    cv2.imwrite(str(bg_dir / "b.png"),
                np.full((32, 32, 3), 200, np.uint8))
    register_split(Split("mi_train_devp", "lm", "train", scene_ids=(1,)))
    cfg = Config().apply_opts([
        "head.num_regions=4", "data.change_bg_prob=1.0",
        f'data.bg_images_dir="{str(bg_dir)}"'])
    assets = synthetic_class_assets(num_regions=4)
    dec = RecordDecoder(cfg, assets, num_pm_points=64)
    it = train_group_iterator(cfg, "mi_train_devp", decoder=dec,
                              batch_size=2 * N_INST, seed=3,
                              frame_bucket=1, yield_keys=True)
    cache = DeviceFrameCache(64 << 20)
    slots = next(it)["frame_slots"]
    assert all(k is None for k, _ in slots)  # every ROI composited
    cache.stack(slots)
    assert len(cache) == 0 and cache.hits == 0
