"""Per-class model assets: points, extents, FPS keypoints, symmetries.

Counterpart of the reference's lazily-cached per-dataset asset getters
(_get_model_points / _get_fps_points / _get_extents / _get_sym_infos,
data_loader.py:209-335): loads eval meshes, samples a fixed number of
points for the PM loss (NUM_PM_POINTS, gdrn_base.py:85), builds
identity-padded symmetry banks, and stacks everything class-major so a
batch can gather by ``roi_cls`` on device.
"""

from __future__ import annotations


from dataclasses import dataclass

import numpy as np

from ..geometry.symmetry import (
    pad_sym_trans,
    pad_symmetries,
    symmetry_transforms,
)
from ..ops.fps import get_fps_and_center
from .inout import load_ply
from .refs import DatasetRef


@dataclass
class ClassAssets:
    """Class-major stacked arrays, indexable by cls_idx."""
    obj_ids: list[int]
    points: np.ndarray        # [C, N, 3]
    extents: np.ndarray       # [C, 3]
    fps_points: np.ndarray    # [C, K, 3]
    sym_rots: np.ndarray      # [C, S, 3, 3] identity-padded
    diameters: np.ndarray     # [C]
    # symmetry TRANSLATIONS [C, S, 3] (m), zero-padded; BOP symmetries are
    # full 4x4 transforms — MSSD/MSPD need t, the PM loss only R
    sym_trans: np.ndarray | None = None
    # FULL-dataset class index per asset row (what class-aware heads were
    # trained with — the subset position desyncs on partial splits);
    # None = assets cover the full dataset, positions coincide
    full_cls_idx: list[int] | None = None

    def for_obj(self, obj_id: int) -> dict[str, np.ndarray]:
        i = self.obj_ids.index(obj_id)
        return {"points": self.points[i], "extent": self.extents[i],
                "fps": self.fps_points[i], "sym_rots": self.sym_rots[i],
                "sym_trans": self.sym_trans[i]
                if self.sym_trans is not None
                else np.zeros((self.sym_rots.shape[1], 3), np.float32),
                "diameter": self.diameters[i]}

    def full_idx(self, obj_id: int) -> int:
        """The model's roi_cls for this object (full-dataset index)."""
        i = self.obj_ids.index(obj_id)
        return self.full_cls_idx[i] if self.full_cls_idx is not None else i


def sample_points(pts: np.ndarray, n: int, seed: int = 2021) -> np.ndarray:
    """Deterministic fixed-count point subsample (with replacement iff
    needed)."""
    rng = np.random.RandomState(seed)
    if len(pts) >= n:
        idx = rng.choice(len(pts), n, replace=False)
    else:
        idx = rng.choice(len(pts), n, replace=True)
    return pts[idx]


def load_class_assets(ref: DatasetRef, num_regions: int = 32,
                      num_pm_points: int = 3000,
                      max_sym_disc_step: float = 0.01,
                      objs: list[str] | None = None,
                      use_eval_models: bool = False) -> ClassAssets:
    """Build the full asset bank for a dataset from its model directory.

    Falls back to computing FPS keypoints with our FPS kernel when the
    precomputed fps_points.pkl is absent (the reference hard-requires the
    pkl, ref/ycbv.py:104-109). ``use_eval_models`` loads the decimated
    ``models_eval`` meshes + their models_info — what the reference scores
    ADD/ADI on (gdrn_custom_evaluator.py model_eval_dir).
    """
    import os

    model_dir = ref.eval_model_dir if use_eval_models else ref.model_dir
    obj_ids = [ref.obj2id[o] for o in (objs or ref.objects)]
    info_path = os.path.join(model_dir, "models_info.json")
    if os.path.exists(info_path):
        from .refs import _load_models_info
        info = _load_models_info(info_path)
    else:
        info = ref.models_info()
    try:
        fps_pkl = ref.fps_points(num_regions)
    except (FileNotFoundError, KeyError):
        fps_pkl = None

    pts_l, ext_l, fps_l, sym_l, symt_l, dia_l = [], [], [], [], [], []
    for oid in obj_ids:
        mi = info[str(oid)]
        ply = load_ply(os.path.join(model_dir, f"obj_{oid:06d}.ply"),
                       vertex_scale=ref.vertex_scale)
        pts = ply["pts"].astype(np.float32)
        pts_l.append(sample_points(pts, num_pm_points))
        # models_info values are in the MESH's native unit (mm for BOP):
        # scale with the ref's vertex_scale exactly like the vertices —
        # a hardcoded /1000 desyncs extents from points for custom
        # datasets registered with vertex_scale != 0.001
        scale = float(ref.vertex_scale)
        ext_l.append(np.array([mi["size_x"], mi["size_y"], mi["size_z"]],
                              np.float32) * scale)
        if fps_pkl is not None and oid in fps_pkl:
            fps = fps_pkl[oid][:num_regions]
        else:
            fps = get_fps_and_center(pts, num_regions)[:-1]
        fps_l.append(fps.astype(np.float32))
        if "symmetries_discrete" in mi or "symmetries_continuous" in mi:
            sym, sym_t = symmetry_transforms(mi, max_sym_disc_step,
                                             trans_scale=scale)
        else:
            sym, sym_t = None, None
        sym_l.append(sym)
        symt_l.append(sym_t)
        dia_l.append(mi.get("diameter", 0.0) * scale)

    sym_bank = pad_symmetries(sym_l)
    return ClassAssets(
        obj_ids=obj_ids,
        full_cls_idx=[ref.obj_ids.index(oid) for oid in obj_ids],
        points=np.stack(pts_l),
        extents=np.stack(ext_l),
        fps_points=np.stack(fps_l),
        sym_rots=sym_bank,
        sym_trans=pad_sym_trans(symt_l, max_syms=sym_bank.shape[1]),
        diameters=np.asarray(dia_l, np.float32),
    )


def synthetic_class_assets(num_regions: int = 32,
                           num_pm_points: int = 256) -> ClassAssets:
    """Cube-only asset bank for tests/smoke (no dataset on disk)."""
    from .synthetic import cube_points
    from ..ops.fps import fps_numpy

    pts = cube_points()
    fps = pts[fps_numpy(pts, num_regions)]
    return ClassAssets(
        obj_ids=[1],
        points=sample_points(pts, num_pm_points)[None],
        extents=np.array([[0.1, 0.1, 0.1]], np.float32),
        fps_points=fps[None],
        sym_rots=pad_symmetries([None]),
        sym_trans=pad_sym_trans([None]),
        diameters=np.asarray([0.1 * np.sqrt(3)], np.float32),
    )
