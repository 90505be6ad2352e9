"""Serving API: frames + detections in, 6DoF poses out.

The deployment-facing entry the reference lacks (its only inference path is
the evaluator loop): load a checkpoint once, then call ``predict`` with RGB-D
frames and per-frame detections. Everything from ROI crop to allo->ego pose
recovery runs inside one jitted program; batches are padded to a fixed size
so the program compiles once.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.assets import ClassAssets
from ..data.pipeline import preprocess_rois_grouped
from ..models import RDPN, dummy_batch
from ..parallel import create_train_state, make_eval_step


@dataclass
class Detection:
    obj_id: int
    bbox_xyxy: np.ndarray          # [4] float
    score: float = 1.0


class Predictor:
    def __init__(self, cfg: Config, assets: ClassAssets,
                 ckpt_dir: str | None = None,
                 params_pkl: str | None = None,
                 batch_size: int = 16,
                 dtype=jnp.bfloat16,
                 allow_random_init: bool = False):
        self.cfg = cfg
        self.assets = assets
        self.batch_size = batch_size
        self.model = RDPN(cfg, dtype=dtype, int8=cfg.test.int8 or False,
                          int8_static=bool(cfg.test.int8
                                           and cfg.test.int8_static))
        variables = self.model.init(jax.random.PRNGKey(0),
                                    dummy_batch(cfg, 2), train=False)
        if params_pkl:
            import pickle

            with open(params_pkl, "rb") as f:
                loaded = pickle.load(f)
            # the pkl must COVER the init tree: a partial merge (renamed
            # head, missing subtree, absent batch_stats) would silently
            # serve random-init leaves / identity BN stats
            _check_covers(variables["params"], loaded.get("params", {}),
                          "params", params_pkl)
            _check_covers(variables.get("batch_stats", {}),
                          loaded.get("batch_stats", {}), "batch_stats",
                          params_pkl)
            variables = {"params": _merge(variables["params"],
                                          loaded["params"]),
                         "batch_stats": _merge(
                             variables.get("batch_stats", {}),
                             loaded.get("batch_stats", {}))}
        # serving needs no optimizer state (identity keeps TrainState's
        # structure without Ranger's 3x-parameter mu/nu/slow copies)
        import optax

        self.state = create_train_state(cfg, variables, optax.identity())
        if ckpt_dir:
            from ..solver import build_optimizer
            from .checkpoint import CheckpointManager

            mgr = CheckpointManager(ckpt_dir)
            if mgr.latest_step() is None:
                raise FileNotFoundError(
                    f"no checkpoint found in {ckpt_dir!r} — a Predictor "
                    "must never silently serve random-init weights")
            # trainer checkpoints carry the FULL optimizer state tree;
            # orbax StandardRestore refuses a template whose opt_state is
            # optax.identity()'s EmptyState (tree-structure mismatch), so
            # restore with a matching template and then drop the solver
            # state for serving
            full = create_train_state(
                cfg, variables, build_optimizer(cfg, total_iters=1))
            restored, _ = mgr.restore(full)
            self.state = self.state.replace(
                params=restored.params, batch_stats=restored.batch_stats)
        elif not params_pkl and not allow_random_init:
            raise ValueError(
                "Predictor requires ckpt_dir or params_pkl (refusing to "
                "serve random-init weights); pass allow_random_init=True "
                "for smoke tests")
        self._eval_step = make_eval_step(cfg, self.model)
        self._key = jax.random.PRNGKey(0)
        self._needs_calibration = bool(cfg.test.int8
                                       and cfg.test.int8_static)

    def predict(self, rgb: np.ndarray, depth: np.ndarray, K: np.ndarray,
                detections: Sequence[Detection]) -> list[dict[str, Any]]:
        """One frame, any number of detections -> [{obj_id, R, t, score}]."""
        n = len(detections)
        if n == 0:
            return []
        bs = self.batch_size
        out_all: list[dict[str, Any]] = []
        # the frame crosses host->device ONCE; every ROI crops it by index
        # inside the jitted graph (data/pipeline.preprocess_rois_grouped)
        frames = {
            # rgb ships in its native dtype (uint8 welcome) — the device
            # pipeline casts; a host astype(float32) would quadruple the
            # host->device bytes of every served frame
            "rgb": jnp.asarray(np.asarray(rgb)[None]),
            "depth": jnp.asarray(np.asarray(depth, np.float32)[None]),
            "K": jnp.asarray(np.asarray(K, np.float32)[None]),
        }
        for lo in range(0, n, bs):
            dets = list(detections[lo:lo + bs])
            pad = bs - len(dets)
            dets_p = dets + [dets[-1]] * pad
            rois = {
                "frame_idx": jnp.zeros((bs,), jnp.int32),
                "bbox": jnp.asarray(np.stack(
                    [np.asarray(d.bbox_xyxy, np.float32)
                     for d in dets_p])),
                "fps": jnp.asarray(np.stack(
                    [self.assets.for_obj(d.obj_id)["fps"]
                     for d in dets_p])),
                "extent": jnp.asarray(np.stack(
                    [self.assets.for_obj(d.obj_id)["extent"]
                     for d in dets_p])),
            }
            batch = preprocess_rois_grouped(self.cfg, frames, rois,
                                            self._key, train=False)
            batch["roi_cls"] = jnp.asarray(
                [self.assets.full_idx(d.obj_id) for d in dets_p],
                jnp.int32)
            if self._needs_calibration:
                # int8 static serving: calibrate activation scales on the
                # first served batch, then lock them in (PERF.md round 3)
                from ..models.quant import calibrate_quant

                quant = calibrate_quant(self.model, self.state.params,
                                        self.state.batch_stats, [batch])
                self._eval_step = make_eval_step(self.cfg, self.model,
                                                 quant=quant)
                self._needs_calibration = False
            out = self._eval_step(self.state, batch)
            R = np.asarray(out["rot_ego"])
            t = np.asarray(out["trans"])
            for i, d in enumerate(dets):
                out_all.append({"obj_id": d.obj_id, "R": R[i], "t": t[i],
                                "score": d.score})
        return out_all


def _merge(dst, src):
    out = dict(dst)
    for k, v in src.items():
        out[k] = _merge(out.get(k, {}), v) if isinstance(v, dict) \
            else np.asarray(v)
    return out


def _tree_paths(t, prefix=()):
    if isinstance(t, dict):
        for k, v in t.items():
            yield from _tree_paths(v, prefix + (str(k),))
    else:
        yield prefix


def _check_covers(init_tree, loaded, name: str, path: str) -> None:
    """The loaded pkl must provide EVERY leaf of the init tree — a partial
    merge would silently serve random-init weights / identity BN stats."""
    missing = set(_tree_paths(init_tree)) - set(_tree_paths(loaded))
    if missing:
        some = sorted("/".join(m) for m in missing)[:5]
        raise ValueError(
            f"{path}: {name} tree does not cover the model — "
            f"{len(missing)} missing leaves (e.g. {some}); refusing to "
            "mix random-init values into served weights")
