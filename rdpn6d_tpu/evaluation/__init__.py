"""Evaluation: pose errors, scoring, evaluator, BOP CSV (lib/pysixd parity)."""

from .evaluator import PoseEvaluator, format_table
from .pose_error import (
    add,
    add_np,
    adi,
    adi_np,
    proj_2d,
    proj_2d_np,
    re_deg,
    re_np,
    te,
    te_np,
)
from .score import auc_posecnn, auc_voc, pose_recalls, summarize_objects

__all__ = [
    "PoseEvaluator", "format_table", "add", "add_np", "adi", "adi_np",
    "proj_2d", "proj_2d_np", "re_deg", "re_np", "te", "te_np",
    "auc_posecnn", "auc_voc", "pose_recalls", "summarize_objects",
]
