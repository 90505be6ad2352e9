"""BOP localization scoring: toolkit matching + recall goldens."""

import numpy as np

from rdpn6d_tpu.evaluation.bop_score import (
    bop19_average_recalls,
    match_poses_bop,
    score_error_recalls,
)


def test_match_poses_bop_score_order_and_threshold():
    # rows already in descending score order; each estimate takes the
    # unmatched GT with the lowest sub-threshold error
    errors = np.array([[0.5, 0.1], [0.2, 0.3]])
    pairs = match_poses_bop(errors, np.full(2, 1.0))
    assert pairs == [(0, 1), (1, 0)]
    # threshold excludes candidates per GT
    pairs = match_poses_bop(errors, np.array([0.25, 0.05]))
    assert pairs == [(1, 0)]  # est 0 has no sub-threshold GT


def test_matching_is_per_threshold_not_global_greedy():
    """BOP semantics: a higher-score estimate keeps its best GT even when
    a globally-greedy assignment would pair differently (toolkit
    pose_matching.py processes estimates by score per threshold)."""
    # est 0 = highest score. Global-greedy by ascending error would pair
    # (e1,g0)=0.1 first and force e0 onto g1 with error 10 (a miss).
    errors = np.array([[0.2, 0.3],    # est 0 (top score)
                       [0.1, 10.0]])  # est 1
    gts = {(1, 0): [{"obj_id": 7, "R": None, "t": None, "diameter": 1.0},
                    {"obj_id": 7, "R": None, "t": None, "diameter": 1.0}]}
    targets = [{"scene_id": 1, "im_id": 0, "obj_id": 7, "inst_count": 2}]
    ests = [{"scene_id": 1, "im_id": 0, "obj_id": 7, "score": 0.9, "i": 0},
            {"scene_id": 1, "im_id": 0, "obj_id": 7, "score": 0.8, "i": 1}]
    gts[(1, 0)][0]["g"] = 0
    gts[(1, 0)][1]["g"] = 1

    out = score_error_recalls(
        ests, gts, targets, lambda e, g: errors[e["i"], g["g"]],
        thresholds=[0.5])
    # est0->gt0 (0.2), then est1->gt1 (10.0, miss): recall = 1/2
    assert out["recall@0.5"] == 0.5


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


def test_vsd_error_fn_with_rasterizer():
    """VSD plugged into the localization scorer via make_vsd_error_fn."""
    from rdpn6d_tpu.evaluation.bop_score import make_vsd_error_fn
    from rdpn6d_tpu.ops.rasterizer import render_mesh

    h = 0.05
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)], np.float32)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    f = np.array([t for a, b, c, d in quads
                  for t in ((a, b, c), (a, c, d))], np.int32)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 0.6], np.float32)
    depth_scene, _ = render_mesh(v, f, K, R, t, 480, 640)

    err_fn = make_vsd_error_fn(
        meshes={1: (v, f)},
        depth_loader=lambda s, i: depth_scene,
        diameters={1: float(0.1 * np.sqrt(3))})
    est = {"scene_id": 0, "im_id": 0, "R": R, "t": t}
    gt = {"obj_id": 1, "R": R, "t": t, "K": K}
    e = err_fn(est, gt)  # error VECTOR over the BOP19 tau grid
    assert e.shape == (10,) and e.max() < 1e-6
    est_bad = {"scene_id": 0, "im_id": 0, "R": R,
               "t": t + np.array([0.2, 0, 0], np.float32)}
    assert err_fn(est_bad, gt).min() > 0.9
