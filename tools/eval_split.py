#!/usr/bin/env python
"""Evaluate a checkpoint on a test split: the scripted test_gdrn.sh path.

Counterpart of the reference's eval flow (test_gdrn.sh -> main_gdrn.py
--eval-only -> do_test -> gdrn_inference_on_dataset -> evaluator): loads a
checkpoint, iterates the split's records (GT or external-detection bboxes),
preprocesses on device, runs the jitted eval step, scores ADD(-S)/AUC/
re/te/proj per object, writes a BOP19 CSV.

Usage:
  python tools/eval_split.py --config-file configs/lm13.py \
      --ckpt-dir output/lm13/ckpt --split lm_13_test \
      [--dets path/to/detections.json] [--use-kabsch]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--split", required=True)
    p.add_argument("--dets", default="",
                   help="external detections json (est-bbox eval)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--csv", default="")
    p.add_argument("--opts", nargs="*", default=[])
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp

    from rdpn6d_tpu.config import load_config
    from rdpn6d_tpu.data.assets import load_class_assets
    from rdpn6d_tpu.data.bop import build_split_records, get_split
    from rdpn6d_tpu.data.detections import attach_detections, load_detections
    from rdpn6d_tpu.data.loader import RecordDecoder
    from rdpn6d_tpu.data.pipeline import preprocess_batch
    from rdpn6d_tpu.data.refs import get_ref
    from rdpn6d_tpu.engine.checkpoint import CheckpointManager
    from rdpn6d_tpu.engine.inference import (
        evaluate_and_report,
        inference_on_dataset,
    )
    from rdpn6d_tpu.evaluation import PoseEvaluator
    from rdpn6d_tpu.models import RDPN, dummy_batch
    from rdpn6d_tpu.parallel import (
        create_train_state,
        make_eval_step,
    )
    from rdpn6d_tpu.solver import build_optimizer

    cfg = load_config(args.config_file, args.opts)
    split = get_split(args.split)
    ref = get_ref(split.ref_name)
    records = build_split_records(split, flatten=True)
    if args.dets:
        records = attach_detections(records, load_detections(args.dets),
                                    topk_per_obj=cfg.data.det_topk_per_obj)
    logging.info(f"{len(records)} test instances")

    assets = load_class_assets(ref, cfg.head.num_regions,
                               cfg.loss.num_pm_points)
    decoder = RecordDecoder(cfg, assets)

    model = RDPN(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), dummy_batch(cfg, 2),
                           train=False)
    tx = build_optimizer(cfg, total_iters=1)
    state = create_train_state(cfg, variables, tx)
    ckpt = CheckpointManager(args.ckpt_dir)
    state, _ = ckpt.restore(state)
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

    bs = args.batch_size
    key = jax.random.PRNGKey(0)

    def batches():
        for i in range(0, len(records), bs):
            chunk = records[i:i + bs]
            samples, meta = [], []
            for rec in chunk:
                try:
                    samples.append(decoder(rec))
                except (FileNotFoundError, OSError) as e:
                    logging.warning(f"skip {rec['rgb_path']}: {e}")
                    continue
                meta.append({
                    "obj_name": id2name[rec["obj_id"]],
                    "R_gt": rec["R"], "t_gt": rec["t"], "K": rec["K"],
                    "scene_id": rec["scene_id"], "im_id": rec["im_id"],
                })
            if not samples:
                continue
            # pad to full batch for one compiled shape
            n = len(samples)
            while len(samples) < bs:
                samples.append(samples[-1])
            stacked = {k: jnp.asarray(np.stack([s[k] for s in samples]))
                       for k in samples[0]}
            batch = preprocess_batch(cfg, stacked, key, train=False)
            yield batch, meta  # meta shorter than bs: extras ignored

    stats = inference_on_dataset(eval_step, state, batches(), evaluator)
    csv = args.csv or os.path.join(args.ckpt_dir, "..",
                                   f"{args.split}_bop19.csv")
    result = evaluate_and_report(evaluator, cfg, obj2id=ref.obj2id,
                                 csv_path=csv)
    logging.info(f"stats: {stats}")
    return result


if __name__ == "__main__":
    main()
