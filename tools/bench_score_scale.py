#!/usr/bin/env python
"""BOP19 scoring at full-split scale (VERDICT r3 #6, scoring half).

Synthesizes a YCB-V-sized estimate set — ``--frames`` images x
``--objs`` objects (default 1000 x 5 = 5000 targets), ~4 estimates per
target with jittered poses — and times the complete in-process BOP19
pipeline (per-target error matrices, the vectorized greedy matcher over
the full threshold grid, AR reduction) plus the PoseEvaluator recall
tables over the same predictions. No images are needed: mssd/mspd are
pure host numpy (the inference half of the scale question is measured
on-chip by tools/eval_split.py on a generated big split; PERF.md).

Reference counterpart: the bundled BOP-toolkit subprocess pipeline
(lib/pysixd/scripts/eval_pose_results_more.py) that the reference runs
over full YCB-V.

Prints one JSON line with wall-clock seconds per stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _rot(rng: np.random.RandomState, scale: float = 1.0) -> np.ndarray:
    import cv2

    return cv2.Rodrigues(rng.randn(3) * scale)[0]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=1000)
    p.add_argument("--objs", type=int, default=5)
    p.add_argument("--pts", type=int, default=500,
                   help="eval-model points per object (BOP models_eval "
                        "meshes are ~1-4k verts; 500 is conservative-fast)")
    p.add_argument("--ests-per-target", type=int, default=4)
    args = p.parse_args()

    from rdpn6d_tpu.evaluation import PoseEvaluator
    from rdpn6d_tpu.evaluation.bop_score import bop19_average_recalls

    rng = np.random.RandomState(0)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1.0]])
    models = {o: rng.randn(args.pts, 3).astype(np.float64) * 0.04
              for o in range(1, args.objs + 1)}
    diameters = {o: 0.15 for o in models}
    sym_rots = {o: np.eye(3)[None] for o in models}

    gts: dict[tuple[int, int], list[dict]] = {}
    targets, estimates = [], []
    for im in range(args.frames):
        gts[(1, im)] = []
        for o in models:
            R = _rot(rng)
            t = np.array([rng.uniform(-0.1, 0.1),
                          rng.uniform(-0.1, 0.1), 1.0])
            gts[(1, im)].append({"obj_id": o, "R": R, "t": t, "K": K})
            targets.append({"scene_id": 1, "im_id": im, "obj_id": o,
                            "inst_count": 1})
            for e in range(args.ests_per_target):
                dR = _rot(rng, 0.02 * (e + 1))
                estimates.append({
                    "scene_id": 1, "im_id": im, "obj_id": o,
                    "score": 1.0 - 0.1 * e, "R": dR @ R,
                    "t": t + rng.randn(3) * 0.002 * (e + 1)})

    t0 = time.perf_counter()
    ars = bop19_average_recalls(estimates, gts, targets, models, sym_rots,
                                diameters)
    t_bop = time.perf_counter() - t0

    # PoseEvaluator recall tables over the best estimate per target
    ev = PoseEvaluator(
        models={f"obj{o}": m.astype(np.float32) for o, m in models.items()},
        diameters={f"obj{o}": d for o, d in diameters.items()},
        n_gts={f"obj{o}": args.frames for o in models})
    best = [e for e in estimates if e["score"] == 1.0]
    gt_of = {(e["scene_id"], e["im_id"], e["obj_id"]):
             next(g for g in gts[(e["scene_id"], e["im_id"])]
                  if g["obj_id"] == e["obj_id"]) for e in best}
    CH = 4096
    t0 = time.perf_counter()
    for i in range(0, len(best), CH):
        ch = best[i:i + CH]
        ev.process_batch(
            [f"obj{e['obj_id']}" for e in ch],
            np.stack([e["R"] for e in ch]),
            np.stack([e["t"] for e in ch]),
            np.stack([gt_of[(e["scene_id"], e["im_id"], e["obj_id"])]["R"]
                      for e in ch]),
            np.stack([gt_of[(e["scene_id"], e["im_id"], e["obj_id"])]["t"]
                      for e in ch]),
            np.tile(K[None], (len(ch), 1, 1)),
            scene_ids=np.asarray([e["scene_id"] for e in ch]),
            im_ids=np.asarray([e["im_id"] for e in ch]))
    tables = ev.evaluate()
    t_tables = time.perf_counter() - t0

    print(json.dumps({
        "frames": args.frames, "targets": len(targets),
        "estimates": len(estimates),
        "bop19_s": round(t_bop, 2), "ars": ars,
        "recall_tables_s": round(t_tables, 2),
        "mean_ad_10": tables["mean"].get("ad_10"),
    }))


if __name__ == "__main__":
    main()
