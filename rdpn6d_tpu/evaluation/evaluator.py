"""Pose evaluator: accumulate per-instance predictions, score ADD(-S)/AUC/
re/te/proj per object, emit tables and BOP19 CSV.

Counterpart of the reference's ``GDRN_EvaluatorCustom``
(gdrn_custom_evaluator.py:48-667) and the BOP CSV glue
(test_utils.py:33-75). Errors are computed BATCHED ON DEVICE (one jitted
program per object over all its test instances) instead of the reference's
per-instance host loop; the recall/AUC summarization is host numpy.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..geometry import closest_rot
from .pose_error import add, adi, proj_2d, re_deg, te
from .score import auc_posecnn, auc_voc, pose_recalls, summarize_objects


@dataclass
class PoseEvaluator:
    """Accumulates (R, t) estimates against GT and scores per object.

    models: {obj_name: [N,3] eval model points (m)}
    diameters: {obj_name: diameter (m)}
    sym_rots: {obj_name: [K,3,3] or None} identity-padded symmetry banks
    """

    models: dict[str, np.ndarray]
    diameters: dict[str, float]
    sym_rots: dict[str, np.ndarray | None] = field(default_factory=dict)
    _preds: dict[str, list[dict]] = field(default_factory=lambda:
                                          defaultdict(list))

    def reset(self) -> None:
        self._preds = defaultdict(list)

    def process(self, obj_name: str, R_est, t_est, R_gt, t_gt, K,
                scene_id: int = 0, im_id: int = 0, score: float = 1.0,
                time: float = -1.0) -> None:
        self._preds[obj_name].append({
            "R": np.asarray(R_est, np.float32),
            "t": np.asarray(t_est, np.float32),
            "R_gt": np.asarray(R_gt, np.float32),
            "t_gt": np.asarray(t_gt, np.float32),
            "K": np.asarray(K, np.float32),
            "scene_id": scene_id, "im_id": im_id, "score": score,
            "time": time,
        })

    # ------------------------------------------------------------------
    def compute_errors(self) -> dict[str, dict[str, np.ndarray]]:
        """Batched on-device error computation per object."""
        out = {}
        for obj, preds in self._preds.items():
            R_est = jnp.asarray(np.stack([p["R"] for p in preds]))
            t_est = jnp.asarray(np.stack([p["t"] for p in preds]))
            R_gt = jnp.asarray(np.stack([p["R_gt"] for p in preds]))
            t_gt = jnp.asarray(np.stack([p["t_gt"] for p in preds]))
            K = jnp.asarray(np.stack([p["K"] for p in preds]))
            pts = jnp.asarray(self.models[obj])[None]

            sym = self.sym_rots.get(obj)
            is_sym = sym is not None and len(sym) > 1
            if is_sym:
                sym_b = jnp.asarray(sym)[None].repeat(R_est.shape[0], 0)
                R_gt_closest = closest_rot(R_est, R_gt, sym_b)
                ad_err = adi(R_est, t_est, R_gt, t_gt, pts)
            else:
                R_gt_closest = R_gt
                ad_err = add(R_est, t_est, R_gt, t_gt, pts)

            out[obj] = {
                "ad": np.asarray(ad_err),
                "add": np.asarray(add(R_est, t_est, R_gt, t_gt, pts)),
                "adi": np.asarray(adi(R_est, t_est, R_gt, t_gt, pts)),
                "re": np.asarray(re_deg(R_est, R_gt_closest)),
                "te": np.asarray(te(t_est, t_gt)),
                "proj": np.asarray(proj_2d(R_est, t_est, R_gt_closest, t_gt,
                                           pts, K)),
            }
        return out

    def evaluate(self) -> dict[str, Any]:
        """Full metric tables: per-object recalls + AUCs + MEAN row."""
        errors = self.compute_errors()
        per_obj = {}
        for obj, err in errors.items():
            rec = pose_recalls(err["ad"], err["re"], err["te"], err["proj"],
                               self.diameters[obj])
            rec["adi_10"] = float(np.mean(
                err["adi"] < self.diameters[obj] * 0.1) * 100.0)
            rec["AUCad"] = auc_posecnn(err["ad"])
            rec["AUCadd"] = auc_posecnn(err["add"])
            rec["AUCadi"] = auc_posecnn(err["adi"])
            rec["AUCad_voc"] = auc_voc(err["ad"] * 100.0)
            rec["ABSad_2cm"] = float(np.mean(err["ad"] < 0.02) * 100.0)
            per_obj[obj] = rec
        return {"per_obj": per_obj, "mean": summarize_objects(per_obj)}

    # ------------------------------------------------------------------
    def bop_rows(self, obj2id: dict[str, int]) -> list[dict]:
        """Rows for inout.save_bop_results_csv (test_utils.py:33-52)."""
        rows = []
        for obj, preds in self._preds.items():
            for p in preds:
                rows.append({
                    "scene_id": p["scene_id"], "im_id": p["im_id"],
                    "obj_id": obj2id[obj], "score": p["score"],
                    "R": p["R"], "t": p["t"], "time": p["time"],
                })
        return rows


def format_table(result: dict[str, Any], metrics=("ad_2", "ad_5", "ad_10",
                                                  "AUCad", "re_2", "te_2",
                                                  "proj_2")) -> str:
    """Plain-text per-object metric table (tabulate-style report,
    gdrn_custom_evaluator.py:669-730)."""
    lines = ["obj        " + " ".join(f"{m:>8}" for m in metrics)]
    for obj, rec in result["per_obj"].items():
        lines.append(f"{obj:<10} "
                     + " ".join(f"{rec[m]:8.2f}" for m in metrics))
    if result["mean"]:
        lines.append(f"{'MEAN':<10} "
                     + " ".join(f"{result['mean'][m]:8.2f}"
                                for m in metrics))
    return "\n".join(lines)
