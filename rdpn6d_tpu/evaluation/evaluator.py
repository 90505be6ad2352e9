"""Pose evaluator: accumulate per-instance predictions, score ADD(-S)/AUC/
re/te/proj per object, emit tables and BOP19 CSV.

Counterpart of the reference's ``GDRN_EvaluatorCustom``
(gdrn_custom_evaluator.py:48-667) and the BOP CSV glue
(test_utils.py:33-75). Errors are computed BATCHED ON DEVICE (one jitted
program per object over all its test instances) instead of the reference's
per-instance host loop; the recall/AUC summarization is host numpy.
Predictions are accumulated as whole-batch array chunks so the host-side
cost per ROI is O(1) appends (the reference's per-ROI dict loop,
gdrn_evaluator.py:128-185, becomes the bottleneck past ~2k poses/s).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("rdpn6d")

from ..geometry import closest_rot
from .pose_error import add, adi, proj_2d, re_deg, te
from .score import auc_posecnn, auc_voc, pose_recalls, summarize_objects


@dataclass
class PoseEvaluator:
    """Accumulates (R, t) estimates against GT and scores per object.

    models: {obj_name: [N,3] eval model points (m)} — use the decimated
    ``models_eval`` meshes like the reference (gdrn_custom_evaluator.py
    model_eval_dir).
    diameters: {obj_name: diameter (m)}
    sym_rots: {obj_name: [K,3,3] or None} identity-padded symmetry banks
    n_gts: {obj_name: #GT instances in the split}; when provided, recall
    denominators are GT counts and missing predictions count as failures
    (gdrn_custom_evaluator.py:580-583). Without it (or with
    ``precision=True``) metrics are over predictions only — the reference's
    ``_eval_predictions_precision`` variant (:731+).
    """

    models: dict[str, np.ndarray]
    diameters: dict[str, float]
    sym_rots: dict[str, np.ndarray | None] = field(default_factory=dict)
    n_gts: dict[str, int] | None = None
    precision: bool = False
    _chunks: list[dict[str, np.ndarray]] = field(default_factory=list)
    # memoized compute_errors result (device ADD/ADI over every
    # prediction is the expensive part; evaluate() and the recall-curve
    # dump both need it) — invalidated whenever _chunks changes
    _err_cache: tuple[int, dict] | None = None

    def reset(self) -> None:
        self._chunks = []
        self._err_cache = None

    def process(self, obj_name: str, R_est, t_est, R_gt, t_gt, K,
                scene_id: int = 0, im_id: int = 0, score: float = 1.0,
                time: float = -1.0) -> None:
        """Single-instance convenience wrapper over ``process_batch``."""
        self.process_batch(
            [obj_name], np.asarray(R_est)[None], np.asarray(t_est)[None],
            np.asarray(R_gt)[None], np.asarray(t_gt)[None],
            np.asarray(K)[None], scene_ids=np.array([scene_id]),
            im_ids=np.array([im_id]), scores=np.array([score]),
            times=np.array([time]))

    def process_batch(self, obj_names: list[str], R_est, t_est, R_gt, t_gt,
                      K, scene_ids=None, im_ids=None, scores=None,
                      times=None) -> None:
        """Append one whole batch of predictions (arrays, leading dim B)."""
        B = len(obj_names)
        self._chunks.append({
            "obj": np.asarray(obj_names, dtype=object),
            "R": np.asarray(R_est, np.float32),
            "t": np.asarray(t_est, np.float32),
            "R_gt": np.asarray(R_gt, np.float32),
            "t_gt": np.asarray(t_gt, np.float32),
            "K": np.asarray(K, np.float32),
            "scene_id": np.zeros(B, np.int64) if scene_ids is None
            else np.asarray(scene_ids, np.int64),
            "im_id": np.zeros(B, np.int64) if im_ids is None
            else np.asarray(im_ids, np.int64),
            "score": np.ones(B, np.float32) if scores is None
            else np.asarray(scores, np.float32),
            "time": np.full(B, -1.0, np.float32) if times is None
            else np.asarray(times, np.float32),
        })

    def merge_chunks(self, chunks: list[dict[str, np.ndarray]]) -> None:
        """Fold in prediction chunks from other hosts
        (parallel.gather_predictions; reference gdrn_evaluator.py:437-447)."""
        self._chunks.extend(chunks)

    @property
    def chunks(self) -> list[dict[str, np.ndarray]]:
        return self._chunks

    def _consolidated(self) -> dict[str, np.ndarray] | None:
        if not self._chunks:
            return None
        return {k: np.concatenate([c[k] for c in self._chunks])
                for k in self._chunks[0]}

    # ------------------------------------------------------------------
    def compute_errors(self) -> dict[str, dict[str, np.ndarray]]:
        """Batched on-device error computation per object."""
        if self._err_cache is not None \
                and self._err_cache[0] == len(self._chunks):
            return self._err_cache[1]
        allp = self._consolidated()
        if allp is None and not self.n_gts:
            return {}
        out = {}
        # iterate over the UNION of predicted and GT objects: an object
        # whose predictions are all missing must still get its inf-padded
        # failure rows, or the MEAN silently skips it
        pred_objs = set(allp["obj"].tolist()) if allp is not None else set()
        objs = pred_objs | (set(self.n_gts) if self.n_gts else set())
        # models order, unknown names last alphabetically: a prediction
        # for an object outside self.models must not throw away a whole
        # completed inference pass at scoring time
        order = {o: i for i, o in enumerate(self.models)}
        unknown = sorted(o for o in objs if o not in order)
        if unknown:
            logger.warning(f"objects without eval models (skipping "
                           f"error computation for them): {unknown}")
        for obj in sorted(objs & set(order), key=order.__getitem__):
            m = (allp["obj"] == obj) if allp is not None \
                else np.zeros(0, bool)
            n_pred = int(m.sum())
            if n_pred > 0:
                R_est = jnp.asarray(allp["R"][m])
                t_est = jnp.asarray(allp["t"][m])
                R_gt = jnp.asarray(allp["R_gt"][m])
                t_gt = jnp.asarray(allp["t_gt"][m])
                K = jnp.asarray(allp["K"][m])
                pts = jnp.asarray(self.models[obj])[None]

                sym = self.sym_rots.get(obj)
                # identity-padded banks (geometry/symmetry.pad_symmetries)
                # make every bank the same length — an object is symmetric
                # only if some entry is a NON-identity rotation
                is_sym = sym is not None and len(sym) > 1 and bool(
                    np.any(np.abs(np.asarray(sym)
                                  - np.eye(3)) > 1e-5))
                add_err = np.asarray(add(R_est, t_est, R_gt, t_gt, pts))
                adi_err = np.asarray(adi(R_est, t_est, R_gt, t_gt, pts))
                if is_sym:
                    sym_b = jnp.asarray(sym)[None].repeat(R_est.shape[0], 0)
                    R_gt_closest = closest_rot(R_est, R_gt, sym_b)
                else:
                    R_gt_closest = R_gt

                err = {
                    "ad": adi_err if is_sym else add_err,
                    "add": add_err,
                    "adi": adi_err,
                    "re": np.asarray(re_deg(R_est, R_gt_closest)),
                    "te": np.asarray(te(t_est, t_gt)),
                    "proj": np.asarray(proj_2d(R_est, t_est, R_gt_closest,
                                               t_gt, pts, K)),
                }
            else:
                err = {k: np.zeros(0, np.float32)
                       for k in ("ad", "add", "adi", "re", "te", "proj")}
            # missing predictions count as failures: pad with +inf so every
            # recall threshold and AUC penalizes them
            # (gdrn_custom_evaluator.py:580-583)
            if self.n_gts is not None and not self.precision:
                n_missing = self.n_gts.get(obj, 0) - n_pred
                if n_missing > 0:
                    err = {k: np.concatenate(
                        [v, np.full(n_missing, np.inf, v.dtype)])
                        for k, v in err.items()}
            if err["ad"].size > 0:
                out[obj] = err
        self._err_cache = (len(self._chunks), out)
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
        """Rows for inout.save_bop_results_csv (test_utils.py:33-52).

        The BOP toolkit requires ONE time value per (scene, image); rows
        of an image that spanned two inference batches carry different
        stamps, so unify to the per-image maximum."""
        allp = self._consolidated()
        if allp is None:
            return []
        im_time: dict[tuple[int, int], float] = {}
        for i in range(len(allp["obj"])):
            k = (int(allp["scene_id"][i]), int(allp["im_id"][i]))
            im_time[k] = max(im_time.get(k, -1.0), float(allp["time"][i]))
        return [{
            "scene_id": int(allp["scene_id"][i]),
            "im_id": int(allp["im_id"][i]),
            "obj_id": obj2id[allp["obj"][i]],
            "score": float(allp["score"][i]),
            "R": allp["R"][i], "t": allp["t"][i],
            "time": im_time[(int(allp["scene_id"][i]),
                             int(allp["im_id"][i]))],
        } for i in range(len(allp["obj"]))]


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
