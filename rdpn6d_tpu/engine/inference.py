"""Inference driver: timed evaluation over a test split.

Counterpart of the reference's ``gdrn_inference_on_dataset``
(gdrn_evaluator.py:573-690): warmup-aware wall-clock split into compute vs
post-process, per-ROI pose extraction, evaluator feeding, BOP CSV export.
The pose path (including allo->ego) is on-device; only the final [B,3,3] /
[B,3] pose tensors cross to the host.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Iterator

import numpy as np

from ..config import Config
from ..data.inout import save_bop_results_csv
from ..evaluation import PoseEvaluator, format_table

logger = logging.getLogger("rdpn6d")


def inference_on_dataset(
    eval_step: Callable,
    state: Any,
    batches: Iterator[tuple[dict, list[dict]]],
    evaluator: PoseEvaluator,
    num_warmup: int = 2,
) -> dict[str, float]:
    """batches yields (device_batch, metadata_rows); metadata_rows[i] must
    carry obj_name/scene_id/im_id/R_gt/t_gt/K for evaluator.process.
    Evaluator feeding is one batched append per step (the reference's
    per-ROI host loop, gdrn_evaluator.py:128-185, caps throughput)."""
    total_process = 0.0
    n_rois = 0
    n_timed = 0
    t_first = None

    def consume(out, meta, per):
        rot = np.asarray(out["rot_ego"])  # blocks on THIS batch only
        trans = np.asarray(out["trans"])
        n = len(meta)
        evaluator.process_batch(
            [row["obj_name"] for row in meta], rot[:n], trans[:n],
            np.stack([row["R_gt"] for row in meta]),
            np.stack([row["t_gt"] for row in meta]),
            np.stack([row["K"] for row in meta]),
            scene_ids=np.array([row.get("scene_id", 0) for row in meta]),
            im_ids=np.array([row.get("im_id", 0) for row in meta]),
            scores=np.array([row.get("score", 1.0) for row in meta],
                            np.float32),
            times=np.full(n, per, np.float32))

    # double-buffered: dispatch batch i+1 BEFORE blocking on batch i, so
    # host conversion/accumulation overlaps device compute (and hides the
    # per-dispatch relay latency; the reference's loop is fully synchronous,
    # gdrn_evaluator.py:603-683)
    pending = None  # (out, meta, t_dispatched)
    i = -1
    for i, (batch, meta) in enumerate(batches):
        t0 = time.perf_counter()
        out = eval_step(state, batch)  # async dispatch
        if pending is not None:
            p_out, p_meta, p_t0 = pending
            consume(p_out, p_meta, (t0 - p_t0) / max(len(p_meta), 1))
            t2 = time.perf_counter()
            if i > num_warmup:
                total_process += t2 - t0
                n_timed += len(p_meta)
                if t_first is None:
                    t_first = p_t0
            n_rois += len(p_meta)
        pending = (out, meta, t0)
    if pending is not None:
        p_out, p_meta, p_t0 = pending
        t_flush = time.perf_counter()
        consume(p_out, p_meta, t_flush - p_t0)
        n_rois += len(p_meta)
        # the flushed batch has index i; fold it into the steady-state
        # window only under the same condition the in-loop path uses
        # (batch j is timed when j+1 > num_warmup) — a run shorter than
        # the warmup window reports no steady-state throughput instead of
        # one that includes compile time
        if i + 1 > num_warmup:
            # its host-processing time counts too: n_timed covers this
            # batch, so total_process must as well (skipping it would
            # understate ms/roi host process by up to the final batch)
            total_process += time.perf_counter() - t_flush
            n_timed += len(p_meta)
            if t_first is None:
                t_first = p_t0
    # wall-clock throughput over the steady-state window (a PARTITION of
    # time — compute and the overlapped host processing are not summed, so
    # nothing is double-counted)
    total_wall = (time.perf_counter() - t_first) if t_first else 0.0
    if n_rois:
        logger.info(
            f"inference: {n_rois} rois, "
            f"{1000 * total_wall / max(n_timed, 1):.2f} ms/roi wall, "
            f"{1000 * total_process / max(n_timed, 1):.3f} ms/roi host "
            f"process (overlapped), "
            f"{n_timed / max(total_wall, 1e-9):.1f} poses/sec")
    return {
        "wall_s": total_wall,        # steady-state window (partition of
        "process_s": total_process,  # time; host process is overlapped)
        "n_rois": n_rois,
    }


def evaluate_and_report(evaluator: PoseEvaluator, cfg: Config,
                        obj2id: dict[str, int] | None = None,
                        csv_path: str | None = None) -> dict[str, Any]:
    """Score + log table + optional BOP19 CSV (test_utils.py:33-75)."""
    result = evaluator.evaluate()
    logger.info("\n" + format_table(result))
    if csv_path and obj2id is not None:
        save_bop_results_csv(csv_path, evaluator.bop_rows(obj2id))
        logger.info(f"wrote BOP19 CSV: {csv_path}")
    return result
