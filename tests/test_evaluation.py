"""Evaluation metrics against hand-computed golden values."""

import os
import jax.numpy as jnp
import numpy as np

from rdpn6d_tpu.evaluation import (
    PoseEvaluator,
    add,
    add_np,
    adi,
    adi_np,
    auc_posecnn,
    auc_voc,
    proj_2d,
    re_deg,
    te,
    pose_recalls,
)
from rdpn6d_tpu.data.inout import (
    load_bop_results_csv,
    save_bop_results_csv,
)


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def test_add_translation_only():
    pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    t0 = np.zeros(3, np.float32)
    t1 = np.array([0.003, 0.004, 0.0], np.float32)  # |t| = 5mm
    e = add(jnp.asarray(R), jnp.asarray(t1), jnp.asarray(R),
            jnp.asarray(t0), jnp.asarray(pts))
    np.testing.assert_allclose(float(e), 0.005, atol=1e-6)
    assert abs(add_np(R, t1, R, t0, pts) - 0.005) < 1e-6


def test_adi_symmetric_object_zero():
    """A ring of points rotated by its own symmetry angle has ~0 ADI but
    large ADD."""
    a = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    pts = np.stack([np.cos(a), np.sin(a), np.zeros_like(a)],
                   -1).astype(np.float32)
    R_gt = np.eye(3, dtype=np.float32)
    R_est = _rotz(2 * np.pi / 64)  # one step of the discrete ring symmetry
    t = np.zeros(3, np.float32)
    e_adi = float(adi(jnp.asarray(R_est), jnp.asarray(t), jnp.asarray(R_gt),
                      jnp.asarray(t), jnp.asarray(pts)))
    e_add = float(add(jnp.asarray(R_est), jnp.asarray(t), jnp.asarray(R_gt),
                      jnp.asarray(t), jnp.asarray(pts)))
    # f32 |a|^2-2ab+|b|^2 distance leaves ~sqrt(eps) noise on unit scale
    assert e_adi < 1e-3
    assert e_add > 0.05
    # host version agrees
    assert abs(adi_np(R_est, t, R_gt, t, pts) - e_adi) < 1e-3


def test_adi_jax_matches_scipy():
    rng = np.random.RandomState(1)
    pts = rng.randn(700, 3).astype(np.float32) * 0.05
    R_est, R_gt = _rotz(0.2), np.eye(3, dtype=np.float32)
    t_est = np.array([0.01, 0, 0], np.float32)
    t_gt = np.zeros(3, np.float32)
    e_jax = float(adi(jnp.asarray(R_est), jnp.asarray(t_est),
                      jnp.asarray(R_gt), jnp.asarray(t_gt),
                      jnp.asarray(pts)))
    e_ref = adi_np(R_est, t_est, R_gt, t_gt, pts)
    np.testing.assert_allclose(e_jax, e_ref, rtol=1e-4, atol=1e-6)


def test_re_te_golden():
    R_gt = np.eye(3, dtype=np.float32)
    R_est = _rotz(np.radians(7.0))
    assert abs(float(re_deg(jnp.asarray(R_est), jnp.asarray(R_gt))) - 7.0) \
        < 1e-3
    assert abs(float(te(jnp.asarray([0.0, 0.03, 0.04]),
                        jnp.asarray([0.0, 0.0, 0.0]))) - 0.05) < 1e-7


def test_proj_2d_golden():
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    pts = np.zeros((10, 3), np.float32)
    R = np.eye(3, dtype=np.float32)
    t_gt = np.array([0, 0, 1.0], np.float32)
    t_est = np.array([0.01, 0, 1.0], np.float32)  # 0.01m at z=1 -> 5 px
    e = proj_2d(jnp.asarray(R), jnp.asarray(t_est), jnp.asarray(R),
                jnp.asarray(t_gt), jnp.asarray(pts), jnp.asarray(K))
    np.testing.assert_allclose(float(e), 5.0, atol=1e-4)


def test_auc_golden():
    # all errors at 5cm: PoseCNN AUC over 10cm = 50%; VOC (1..10cm) = 50%
    errs = np.full(100, 0.05)
    assert abs(auc_posecnn(errs) - 50.0) < 1.0
    assert abs(auc_voc(errs * 100) - 50.0) < 1e-6
    assert auc_posecnn(np.full(10, 1e-6)) > 99.0
    assert auc_posecnn(np.full(10, 1.0)) == 0.0


def test_recalls_golden():
    diameter = 0.2
    ad_errors = np.array([0.001, 0.015, 0.025])  # thr at 10% = 0.02
    rec = pose_recalls(ad_errors, np.array([1.0, 4.0, 20.0]),
                       np.array([0.01, 0.03, 0.2]),
                       np.array([1.0, 4.0, 20.0]), diameter)
    np.testing.assert_allclose(rec["ad_10"], 200.0 / 3, atol=1e-4)
    np.testing.assert_allclose(rec["re_5"], 200.0 / 3, atol=1e-4)
    np.testing.assert_allclose(rec["te_2"], 100.0 / 3, atol=1e-4)
    np.testing.assert_allclose(rec["rete_5"], 200.0 / 3, atol=1e-4)


def test_evaluator_end_to_end(tmp_path):
    pts = np.random.RandomState(0).randn(200, 3).astype(np.float32) * 0.05
    ev = PoseEvaluator(models={"cube": pts}, diameters={"cube": 0.2},
                       sym_rots={"cube": None})
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    for i in range(10):
        # half perfect, half off by 5 cm
        t_est = np.array([0, 0, 1.0]) + (0.05 if i % 2 else 0.0)
        ev.process("cube", R, t_est, R, np.array([0, 0, 1.0]), K,
                   scene_id=1, im_id=i)
    res = ev.evaluate()
    assert abs(res["per_obj"]["cube"]["ad_10"] - 50.0) < 1e-5
    assert res["mean"]["ad_10"] == res["per_obj"]["cube"]["ad_10"]

    # BOP CSV round-trip
    rows = ev.bop_rows({"cube": 7})
    path = str(tmp_path / "result.csv")
    save_bop_results_csv(path, rows)
    back = load_bop_results_csv(path)
    assert len(back) == 10
    assert back[0]["obj_id"] == 7
    np.testing.assert_allclose(back[0]["R"], R, atol=1e-6)


def test_identity_padded_sym_bank_does_not_flip_add_to_adi():
    """Production sym banks are identity-padded to a common K_max
    (geometry/symmetry.pad_symmetries), so bank LENGTH cannot mean
    'symmetric' — an all-identity bank must score with ADD, not ADI
    (round-2 regression: every asymmetric object silently scored ADI)."""
    pts = np.random.RandomState(1).randn(100, 3).astype(np.float32) * 0.05
    # identity-padded bank of length 4 = asymmetric object
    bank = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    R_gt = np.eye(3, dtype=np.float32)
    # 180-deg z flip: ADI is tiny for symmetric-ish point sets, ADD large
    R_est = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    t = np.array([0, 0, 1.0])

    ev = PoseEvaluator(models={"o": pts}, diameters={"o": 0.2},
                       sym_rots={"o": bank})
    ev.process("o", R_est, t, R_gt, t, K, im_id=0)
    err = ev.compute_errors()["o"]
    assert err["ad"][0] == err["add"][0]  # identity bank -> ADD
    assert err["ad"][0] > err["adi"][0]

    # a bank with a REAL non-identity rotation -> ADI ('ad' = adi branch)
    bank2 = bank.copy()
    bank2[1] = np.diag([-1.0, -1.0, 1.0])
    ev2 = PoseEvaluator(models={"o": pts}, diameters={"o": 0.2},
                        sym_rots={"o": bank2})
    ev2.process("o", R_est, t, R_gt, t, K, im_id=0)
    err2 = ev2.compute_errors()["o"]
    assert err2["ad"][0] == err2["adi"][0]


def test_object_with_zero_predictions_still_counts_as_failures():
    """An object that has GT instances but no predictions at all must get
    inf-padded failure rows and appear in per_obj/MEAN (round-2
    regression: it silently vanished, inflating the MEAN)."""
    pts = np.random.RandomState(2).randn(50, 3).astype(np.float32) * 0.05
    ev = PoseEvaluator(models={"a": pts, "b": pts},
                       diameters={"a": 0.2, "b": 0.2},
                       sym_rots={"a": None, "b": None},
                       n_gts={"a": 2, "b": 3})
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 1.0])
    ev.process("a", R, t, R, t, K, im_id=0)  # 'b' gets NO predictions
    res = ev.evaluate()
    assert res["per_obj"]["a"]["ad_10"] == 50.0   # 1 hit of 2 GT
    assert res["per_obj"]["b"]["ad_10"] == 0.0    # all 3 GT are misses
    np.testing.assert_allclose(res["mean"]["ad_10"], 25.0)


def test_precision_mode_ignores_undetected():
    """``precision=True`` = the reference's _eval_predictions_precision
    (gdrn_custom_evaluator.py:731+): metrics over PREDICTIONS only,
    undetected GT instances ignored instead of inf-padded failures.
    Wired at the CLI as ``test.eval_precision`` (eval_runner.py)."""
    pts = np.random.RandomState(2).randn(50, 3).astype(np.float32) * 0.05
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 1.0])

    kw = dict(models={"a": pts}, diameters={"a": 0.2},
              sym_rots={"a": None}, n_gts={"a": 4})
    recall_ev = PoseEvaluator(**kw)
    prec_ev = PoseEvaluator(precision=True, **kw)
    for ev in (recall_ev, prec_ev):
        ev.process("a", R, t, R, t, K, im_id=0)
        ev.process("a", R, t, R, t, K, im_id=1)  # 2 perfect of 4 GT
    assert recall_ev.evaluate()["per_obj"]["a"]["ad_10"] == 50.0
    assert prec_ev.evaluate()["per_obj"]["a"]["ad_10"] == 100.0
    # rete_N combined (deg, cm) thresholds ride along in both modes
    assert prec_ev.evaluate()["per_obj"]["a"]["rete_2"] == 100.0

    from rdpn6d_tpu.config import Config

    assert Config().apply_opts(
        ["test.eval_precision=true"]).test.eval_precision


def test_recall_curve_dumps(tmp_path):
    """eval_plots counterpart: recall-vs-threshold CSVs per error type
    with per-object + MEAN columns (reference lib/pysixd/eval_plots.py)."""
    from rdpn6d_tpu.evaluation.plots import dump_recall_curves, recall_curve

    errs = {
        "ape": {"ad": np.array([0.005, 0.02, np.inf]),
                "re": np.array([1.0, 3.0, np.inf]),
                "te": np.array([0.001, 0.02, np.inf]),
                "proj": np.array([2.0, 10.0, np.inf])},
        "can": {"ad": np.array([0.01, 0.01]),
                "re": np.array([2.0, 2.0]),
                "te": np.array([0.005, 0.005]),
                "proj": np.array([3.0, 3.0])},
    }
    diam = {"ape": 0.1, "can": 0.08}
    out = dump_recall_curves(errs, diam, str(tmp_path), png=False)
    names = {os.path.basename(p) for p in out}
    assert {"recall_ad.csv", "recall_re.csv", "recall_te.csv",
            "recall_proj.csv"} <= names

    import csv as _csv
    with open(tmp_path / "recall_ad.csv") as f:
        rows = list(_csv.reader(f))
    assert rows[0] == ["threshold_diameter_frac", "ape", "can", "MEAN"]
    data = np.array(rows[1:], np.float64)
    # at 0.1d: ape has 1/3 below 0.01m? 0.005<0.01 -> 1/3; can 0/2 below
    # 0.008 -> 0; find the grid row closest to 0.1
    i = np.argmin(np.abs(data[:, 0] - 0.1))
    assert abs(data[i, 1] - 1 / 3) < 1e-6
    assert data[i, 2] == 0.0
    np.testing.assert_allclose(data[:, 3],
                               (data[:, 1] + data[:, 2]) / 2, atol=1e-5)
    # monotone nondecreasing, inf rows never counted
    assert (np.diff(data[:, 1]) >= -1e-12).all()
    assert data[-1, 1] <= 2 / 3 + 1e-5

    # unit check on the standalone helper
    r = recall_curve(np.array([1.0, 2.0, np.inf]),
                     np.array([0.5, 1.5, 2.5]))
    np.testing.assert_allclose(r, [0, 1 / 3, 2 / 3])
