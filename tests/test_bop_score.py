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


def test_match_counts_batch_equals_per_threshold_greedy():
    """Vectorized matching reproduces match_poses_bop for every threshold
    on random error matrices (incl. degenerate shapes)."""
    from rdpn6d_tpu.evaluation.bop_score import match_counts_batch

    rng = np.random.RandomState(0)
    for trial in range(30):
        E = rng.randint(0, 5)
        G = rng.randint(1, 5)
        errors = rng.rand(E, G) * 2.0
        diam = rng.rand(G) + 0.5
        thrs = np.linspace(0.05, 1.5, 7)
        thr_mat = thrs[:, None] * diam[None, :]
        counts = match_counts_batch(errors, thr_mat)
        for t_i, thr in enumerate(thrs):
            want = len(match_poses_bop(errors, thr * diam))
            assert counts[t_i] == want, (trial, t_i)


def test_vsd_render_cache_and_equivalence():
    """Cached-render VSD equals the direct vsd() computation, and the GT
    render is computed once across many estimates of the same target."""
    import jax  # noqa: F401  (keeps platform init consistent)

    from rdpn6d_tpu.evaluation.bop_errors import vsd
    from rdpn6d_tpu.evaluation.bop_score import make_vsd_error_fn
    h = 0.05
    verts = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                      for z in (-h, h)], np.float32)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = np.array([tri for a, b, c, d in quads
                      for tri in ((a, b, c), (a, c, d))], np.int32)
    K = np.array([[300.0, 0, 32], [0, 300.0, 32], [0, 0, 1]])
    R_gt = np.eye(3)
    t_gt = np.array([0.0, 0.0, 0.5])
    depth_scene = np.zeros((64, 64), np.float64)

    diam = float(np.sqrt(3) * 0.1)
    fn = make_vsd_error_fn({7: (verts, faces)},
                           lambda s, i: depth_scene, {7: diam},
                           taus=(0.1, 0.3))
    gt = {"obj_id": 7, "R": R_gt, "t": t_gt, "K": K}
    ests = [{"scene_id": 0, "im_id": 0, "R": R_gt,
             "t": t_gt + np.array([0.0, 0.0, 0.002 * i])}
            for i in range(4)]
    got = [fn(e, gt) for e in ests]
    for e, g in zip(ests, got):
        want = vsd(e["R"], e["t"], R_gt, t_gt, depth_scene, K, verts,
                   faces, taus=(0.1, 0.3), diameter=diam)
        np.testing.assert_allclose(g, want, atol=1e-12)
    info = fn.render_cache_info()
    # est0 shares the GT pose -> 4 unique renders; the GT render is
    # reused for ests 1..3 and est0 hits the GT entry = 4 hits
    assert info.misses == 4 and info.hits == 4, info
