"""Reusable split-evaluation runner (shared by main --eval-only and
tools/eval_split.py).

Counterpart of the reference's do_test path (engine.py:126-156 +
gdrn_inference_on_dataset): records -> decode -> on-device preprocess ->
jitted eval step -> PoseEvaluator -> tables + BOP19 CSV.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import numpy as np

from ..config import Config

logger = logging.getLogger("rdpn6d")


def run_eval(cfg: Config, ckpt_dir: str, split_name: str,
             dets_path: str = "", batch_size: int = 32,
             csv_path: str | None = None,
             state: Any = None, model: Any = None) -> dict[str, Any]:
    import jax
    import jax.numpy as jnp

    from ..data.assets import load_class_assets
    from ..data.bop import build_split_records, get_split
    from ..data.detections import attach_detections, load_detections
    from ..data.loader import RecordDecoder
    from ..data.pipeline import preprocess_batch
    from ..data.refs import get_ref
    from ..evaluation import PoseEvaluator
    from ..models import RDPN, dummy_batch
    from ..parallel import create_train_state, make_eval_step
    from ..solver import build_optimizer
    from .checkpoint import CheckpointManager
    from .inference import evaluate_and_report, inference_on_dataset

    split = get_split(split_name)
    ref = get_ref(split.ref_name)
    records = build_split_records(split, flatten=True)
    if dets_path:
        records = attach_detections(records, load_detections(dets_path),
                                    topk_per_obj=cfg.data.det_topk_per_obj)
    logger.info(f"{len(records)} test instances in {split_name}")

    present = sorted({rec["obj_id"] for rec in records})
    assets = load_class_assets(ref, cfg.head.num_regions,
                               cfg.loss.num_pm_points,
                               objs=[ref.id2obj[oid] for oid in present])
    decoder = RecordDecoder(cfg, assets, train=False)

    if model is None:
        model = RDPN(cfg, dtype=jnp.bfloat16)
    if state is None:
        variables = model.init(jax.random.PRNGKey(0), dummy_batch(cfg, 2),
                               train=False)
        tx = build_optimizer(cfg, total_iters=1)
        state = create_train_state(cfg, variables, tx)
        state, _ = CheckpointManager(ckpt_dir).restore(state)
    eval_step = make_eval_step(cfg, model)

    id2name = {oid: ref.id2obj[oid] for oid in ref.obj_ids}
    evaluator = PoseEvaluator(
        models={ref.id2obj[oid]: assets.for_obj(oid)["points"]
                for oid in assets.obj_ids},
        diameters={ref.id2obj[oid]: float(assets.for_obj(oid)["diameter"])
                   or ref.diameter_m(oid) for oid in assets.obj_ids},
        sym_rots={ref.id2obj[oid]: assets.for_obj(oid)["sym_rots"]
                  for oid in assets.obj_ids},
    )

    key = jax.random.PRNGKey(0)

    # fuse preprocessing + model into ONE compiled program per batch:
    # a single device dispatch instead of two (relay round-trips are the
    # fixed cost of small-batch eval)
    inner_eval = eval_step

    def fused_step(state, frames):
        batch = preprocess_batch(cfg, frames, key, train=False)
        batch["roi_cls"] = frames["roi_cls"]
        return inner_eval(state, batch)

    eval_step_fused = jax.jit(fused_step)

    def batches():
        for i in range(0, len(records), batch_size):
            chunk = records[i:i + batch_size]
            samples, meta = [], []
            for rec in chunk:
                try:
                    samples.append(decoder(rec))
                except (FileNotFoundError, OSError) as e:
                    logger.warning(f"skip {rec['rgb_path']}: {e}")
                    continue
                meta.append({
                    "obj_name": id2name[rec["obj_id"]],
                    "R_gt": rec["R"], "t_gt": rec["t"], "K": rec["K"],
                    "scene_id": rec["scene_id"], "im_id": rec["im_id"],
                })
            if not samples:
                continue
            while len(samples) < batch_size:  # pad: one compiled shape
                samples.append(samples[-1])
            stacked = {k: jnp.asarray(np.stack([s[k] for s in samples]))
                       for k in samples[0]}
            yield stacked, meta

    stats = inference_on_dataset(eval_step_fused, state, batches(),
                                 evaluator)

    csv = csv_path or os.path.join(cfg.train.output_dir,
                                   f"{split_name}_bop19.csv")
    result = evaluate_and_report(evaluator, cfg, obj2id=ref.obj2id,
                                 csv_path=csv)
    result["stats"] = stats
    return result
