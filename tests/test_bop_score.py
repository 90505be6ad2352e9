"""BOP localization scoring: greedy matching + recall goldens."""

import numpy as np

from rdpn6d_tpu.evaluation.bop_score import (
    bop19_average_recalls,
    greedy_match,
    score_error_recalls,
)


def test_greedy_match_prefers_lowest():
    errors = np.array([[0.5, 0.1], [0.2, 0.3]])
    pairs = greedy_match(errors)
    assert (0, 1) in pairs and (1, 0) in pairs


def test_score_recalls_simple():
    R = np.eye(3, dtype=np.float32)
    gts = {(1, 0): [{"obj_id": 7, "R": R, "t": np.zeros(3),
                     "diameter": 0.2}]}
    targets = [{"scene_id": 1, "im_id": 0, "obj_id": 7, "inst_count": 1}]
    ests = [{"scene_id": 1, "im_id": 0, "obj_id": 7, "score": 1.0,
             "R": R, "t": np.array([0.015, 0, 0])}]  # err = 1.5cm

    def err_te(e, g):
        return float(np.linalg.norm(e["t"] - g["t"]))

    out = score_error_recalls(ests, gts, targets, err_te,
                              thresholds=[0.01, 0.02, 0.05])
    assert out["recall@0.01"] == 0.0
    assert out["recall@0.02"] == 1.0
    assert abs(out["AR"] - 2.0 / 3) < 1e-9


def test_score_recalls_missing_estimate_counts_as_miss():
    R = np.eye(3, dtype=np.float32)
    gts = {(1, 0): [{"obj_id": 7, "R": R, "t": np.zeros(3)}]}
    targets = [{"scene_id": 1, "im_id": 0, "obj_id": 7, "inst_count": 2}]
    ests = [{"scene_id": 1, "im_id": 0, "obj_id": 7, "score": 1.0,
             "R": R, "t": np.zeros(3)}]
    out = score_error_recalls(ests, gts, targets, lambda e, g: 0.0, [1.0])
    assert out["AR"] == 0.5  # 1 of 2 target instances matched


def test_bop19_average_recalls_perfect():
    rng = np.random.RandomState(0)
    pts = rng.randn(50, 3).astype(np.float32) * 0.05
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 0.6], np.float32)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    gts = {(1, 0): [{"obj_id": 3, "R": R, "t": t, "K": K}]}
    targets = [{"scene_id": 1, "im_id": 0, "obj_id": 3, "inst_count": 1}]
    ests = [{"scene_id": 1, "im_id": 0, "obj_id": 3, "score": 1.0,
             "R": R, "t": t}]
    out = bop19_average_recalls(
        ests, gts, targets, models={3: pts},
        sym_rots={3: np.eye(3, dtype=np.float32)[None]},
        diameters={3: 0.2})
    assert out["AR_mssd"] == 1.0
    assert out["AR_mspd"] == 1.0
    assert out["AR"] == 1.0
