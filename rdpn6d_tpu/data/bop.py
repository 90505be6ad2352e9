"""BOP-layout scene loaders -> flat per-instance records.

Counterpart of the reference's dataset builders
(core/gdrn_modeling/datasets/ycbv_d2.py:255-296, lm_dataset_d2.py,
mp6d.py:144-163) without the detectron2 DatasetCatalog machinery: a split is
described by a ``Split`` dataclass, built into a list of plain dicts, cached
as a pickle keyed by a content hash. Train records are flattened per
instance (the reference's ``flat_dataset_dicts``, dataset_utils.py:28-51);
test records stay per-image with all instances.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from dataclasses import dataclass

import numpy as np

from .inout import (
    load_bop_targets,
    load_scene_camera,
    load_scene_gt,
    load_scene_gt_info,
)
from .refs import DatasetRef, get_ref


@dataclass(frozen=True)
class Split:
    """A named dataset split: which scenes of which subdir to load."""
    name: str                      # e.g. "ycbv_train_real"
    ref_name: str                  # key into data.refs.REFS
    subdir: str                    # e.g. "train_real", "test", "train_pbr"
    scene_ids: tuple[int, ...] = ()
    objs: tuple[str, ...] = ()     # subset of objects ("" = all)
    filter_invalid: bool = True
    visib_thr: float = 0.0
    targets_file: str = ""         # BOP19 targets json (test splits)


def _scene_dir(ref: DatasetRef, subdir: str, scene_id: int) -> str:
    return os.path.join(ref.root, subdir, f"{scene_id:06d}")


def _rgb_path(ref: DatasetRef, sdir: str, im_id: int) -> str:
    if ref.layout == "ycb_style":
        return os.path.join(sdir, f"{im_id:06d}-color.png")
    for sub, ext in (("rgb", "png"), ("rgb", "jpg"), ("gray", "tif")):
        p = os.path.join(sdir, sub, f"{im_id:06d}.{ext}")
        if os.path.exists(p):
            return p
    return os.path.join(sdir, "rgb", f"{im_id:06d}.png")


def _depth_path(ref: DatasetRef, sdir: str, im_id: int) -> str:
    if ref.layout == "ycb_style":
        return os.path.join(sdir, f"{im_id:06d}-depth.png")
    return os.path.join(sdir, "depth", f"{im_id:06d}.png")


def _mask_visib_path(sdir: str, im_id: int, inst_idx: int) -> str:
    return os.path.join(sdir, "mask_visib", f"{im_id:06d}_{inst_idx:06d}.png")


def _xyz_path(sdir: str, im_id: int, inst_idx: int) -> str:
    """Precomputed NOCS-style GT coordinate crop (tools/gen_xyz_crop.py)."""
    return os.path.join(sdir, "xyz_crop", f"{im_id:06d}_{inst_idx:06d}.pkl")


def _build_ycb_style_records(split: Split, ref: DatasetRef,
                             sel_ids: set[int],
                             obj_ids_sorted: list[int]) -> list[dict]:
    """YCB-Video/MP6D layout: data/{scene:04d}/{im:06d}-{color,depth,
    label}.png + -meta.mat (PoseCNN convention; reference mp6d.py:140-163).

    meta.mat keys: cls_indexes [n], poses [3,4,n], intrinsic_matrix,
    factor_depth.
    """
    import glob

    from scipy.io import loadmat

    records = []
    for scene_id in split.scene_ids:
        sdir = os.path.join(ref.root, split.subdir, f"{scene_id:04d}")
        if not os.path.isdir(sdir):
            continue
        for rgb_path in sorted(glob.glob(os.path.join(sdir,
                                                      "*-color.png"))):
            im_id = int(os.path.basename(rgb_path).split("-")[0])
            base = rgb_path[:-len("-color.png")]
            meta = loadmat(base + "-meta.mat")
            K = np.asarray(meta["intrinsic_matrix"], np.float64)
            factor = float(np.squeeze(meta.get("factor_depth",
                                               ref.depth_factor)))
            cls = np.atleast_1d(np.squeeze(
                meta["cls_indexes"])).astype(int)
            poses = np.asarray(meta["poses"], np.float64)
            if poses.ndim == 2:
                poses = poses[..., None]
            for j, obj_id in enumerate(cls):
                if obj_id not in sel_ids:
                    continue
                P = poses[:, :, j]
                records.append({
                    "dataset_name": split.name,
                    "ref_name": split.ref_name,
                    "scene_id": scene_id,
                    "im_id": im_id,
                    "rgb_path": rgb_path,
                    "depth_path": base + "-depth.png",
                    "label_path": base + "-label.png",
                    "label_obj_id": int(obj_id),
                    "depth_factor": factor,
                    "K": K.astype(np.float32),
                    "height": ref.height,
                    "width": ref.width,
                    "obj_id": int(obj_id),
                    "cls_idx": obj_ids_sorted.index(int(obj_id)),
                    "R": P[:3, :3].astype(np.float32),
                    "t": P[:3, 3].astype(np.float32),
                    "visib_fract": 1.0,
                    "bbox_visib": None,
                    "mask_visib_path": "",
                    "xyz_path": _xyz_path(sdir, im_id, j),
                    "inst_idx": j,
                })
    return records


def build_split_records(split: Split, cache_dir: str | None = None,
                        flatten: bool = True) -> list[dict]:
    """Parse scene_gt/scene_camera/scene_gt_info into instance records."""
    ref = get_ref(split.ref_name)
    cache_key = hashlib.md5(repr(split).encode()).hexdigest()[:12]
    if cache_dir:
        cache_path = os.path.join(
            cache_dir, f"{split.name}_{cache_key}_{int(flatten)}.pkl")
        if os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                return pickle.load(f)

    sel_objs = set(split.objs) if split.objs else set(ref.objects)
    if ref.layout == "ycb_style":
        records = _build_ycb_style_records(
            split, ref, {ref.obj2id[o] for o in sel_objs}, ref.obj_ids)
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            with open(cache_path, "wb") as f:
                pickle.dump(records, f)
        return records
    sel_ids = {ref.obj2id[o] for o in sel_objs}
    obj_ids_sorted = ref.obj_ids
    records = []
    for scene_id in split.scene_ids:
        sdir = _scene_dir(ref, split.subdir, scene_id)
        gt = load_scene_gt(os.path.join(sdir, "scene_gt.json"))
        cams = load_scene_camera(os.path.join(sdir, "scene_camera.json"))
        info_path = os.path.join(sdir, "scene_gt_info.json")
        infos = load_scene_gt_info(info_path) if os.path.exists(info_path) \
            else {}
        for im_id, insts in sorted(gt.items()):
            cam = cams[im_id]
            image_rec = {
                "dataset_name": split.name,
                "ref_name": split.ref_name,
                "scene_id": scene_id,
                "im_id": im_id,
                "rgb_path": _rgb_path(ref, sdir, im_id),
                "depth_path": _depth_path(ref, sdir, im_id),
                "depth_factor": ref.depth_factor / cam.get("depth_scale", 1.0)
                if "depth_scale" in cam else ref.depth_factor,
                "K": cam["K"].astype(np.float32),
                "height": ref.height,
                "width": ref.width,
            }
            inst_recs = []
            for inst_idx, inst in enumerate(insts):
                if inst["obj_id"] not in sel_ids:
                    continue
                info = infos.get(im_id, [{}] * len(insts))[inst_idx] \
                    if infos else {}
                visib = info.get("visib_fract", 1.0)
                if split.filter_invalid and visib < max(split.visib_thr,
                                                        1e-9):
                    continue
                bbox = info.get("bbox_visib", None) or info.get(
                    "bbox_obj", None)
                rec = {
                    "obj_id": inst["obj_id"],
                    "cls_idx": obj_ids_sorted.index(inst["obj_id"]),
                    "R": inst["R"].astype(np.float32),
                    "t": inst["t"].astype(np.float32),
                    "visib_fract": visib,
                    "bbox_visib": np.asarray(
                        bbox, np.float32) if bbox is not None else None,
                    "mask_visib_path": _mask_visib_path(sdir, im_id,
                                                        inst_idx),
                    "xyz_path": _xyz_path(sdir, im_id, inst_idx),
                    "inst_idx": inst_idx,
                }
                inst_recs.append(rec)
            if not inst_recs:
                continue
            if flatten:
                for rec in inst_recs:
                    records.append({**image_rec, **rec})
            else:
                records.append({**image_rec, "instances": inst_recs})

    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        with open(cache_path, "wb") as f:
            pickle.dump(records, f)
    return records


# ---------------------------------------------------------------------------
# split registry (counterpart of the SPLITS_* dicts,
# lm_dataset_d2.py:304-580 / ycbv_d2.py / mp6d.py:468-515)
# ---------------------------------------------------------------------------

_SPLITS: dict[str, Split] = {}


def register_split(split: Split) -> None:
    _SPLITS[split.name] = split


def get_split(name: str) -> Split:
    if name not in _SPLITS:
        raise KeyError(f"unknown split {name}; have {sorted(_SPLITS)}")
    return _SPLITS[name]


def available_splits() -> list[str]:
    return sorted(_SPLITS)


def _register_defaults() -> None:
    from .refs import LM13_OBJECTS, LM

    lm13_ids = tuple(LM.obj2id[o] for o in LM13_OBJECTS)
    register_split(Split("lm_13_train", "lm", "train",
                         scene_ids=lm13_ids, objs=LM13_OBJECTS))
    register_split(Split("lm_13_test", "lm", "test",
                         scene_ids=lm13_ids, objs=LM13_OBJECTS,
                         targets_file="test_targets_bop19.json"))
    register_split(Split("lmo_train", "lmo", "train",
                         scene_ids=(2,)))
    register_split(Split("lmo_bop_test", "lmo", "test", scene_ids=(2,),
                         targets_file="test_targets_bop19.json"))
    register_split(Split("lmo_pbr_train", "lmo", "train_pbr",
                         scene_ids=tuple(range(50))))
    register_split(Split("ycbv_train_real", "ycbv", "train_real",
                         scene_ids=tuple(i for i in range(92)
                                         if i not in range(48, 60))))
    register_split(Split("ycbv_train_pbr", "ycbv", "train_pbr",
                         scene_ids=tuple(range(50))))
    register_split(Split("ycbv_test", "ycbv", "test",
                         scene_ids=tuple(range(48, 60)),
                         targets_file="test_targets_bop19.json"))
    register_split(Split("mp6d_train", "mp6d", "data",
                         scene_ids=tuple(range(1, 21))))
    register_split(Split("mp6d_test", "mp6d", "data",
                         scene_ids=tuple(range(1, 21))))
    register_split(Split("tless_primesense_train", "tless",
                         "train_primesense", scene_ids=tuple(range(1, 31))))
    register_split(Split("tless_bop_test", "tless", "test_primesense",
                         scene_ids=tuple(range(1, 21)),
                         targets_file="test_targets_bop19.json"))
    register_split(Split("itodd_pbr_train", "itodd", "train_pbr",
                         scene_ids=tuple(range(50))))
    register_split(Split("itodd_bop_test", "itodd", "test",
                         scene_ids=(1,),
                         targets_file="test_targets_bop19.json"))
    register_split(Split("hb_pbr_train", "hb", "train_pbr",
                         scene_ids=tuple(range(50))))
    register_split(Split("hb_bop_test", "hb", "test_primesense",
                         scene_ids=(3, 5, 13),
                         targets_file="test_targets_bop19.json"))
    register_split(Split("tudl_train_real", "tudl", "train_real",
                         scene_ids=(1, 2, 3)))
    register_split(Split("tudl_bop_test", "tudl", "test",
                         scene_ids=(1, 2, 3),
                         targets_file="test_targets_bop19.json"))
    register_split(Split("icbin_pbr_train", "icbin", "train_pbr",
                         scene_ids=tuple(range(50))))
    register_split(Split("icbin_bop_test", "icbin", "test",
                         scene_ids=(1, 2, 3),
                         targets_file="test_targets_bop19.json"))
    # per-object LM "SO" splits (reference lm_dataset_d2.py:360-580)
    for obj in LM.objects:
        oid = LM.obj2id[obj]
        register_split(Split(f"lm_{obj}_train", "lm", "train",
                             scene_ids=(oid,), objs=(obj,)))
        register_split(Split(f"lm_{obj}_test", "lm", "test",
                             scene_ids=(oid,), objs=(obj,)))


_register_defaults()


def load_bop19_targets(ref: DatasetRef, targets_file: str) -> list[dict]:
    return load_bop_targets(os.path.join(ref.root, targets_file))
