"""Full-protocol rehearsal chain (VERDICT r2 #3), slow integration test.

Drives tools/rehearse_protocol.py end to end as subprocesses — generated
mini-BOP dataset -> compute_fps -> gen_xyz_crop -> train CLI -> GT-bbox
eval -> est-bbox eval (jittered detections with misses) -> BOP19 AR ->
score_csv rescore — with a small model so it fits CI. Accuracy gating at
flagship scale runs on real hardware (tools/rehearse_protocol.py --gate;
per-round numbers in PERF.md); here the assertions are structural: every
stage exits 0, the summary exists, metrics are finite and the AR fields
are in range.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMALL_OPTS = [
    "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
    "head.num_regions=4", "head.num_filters=32", "data.input_res=64",
    "data.out_res=16", "loss.num_pm_points=64", "solver.ims_per_batch=8",
    "solver.optimizer=adamw", "solver.warmup_iters=10",
    'test.error_types="ad,adi,re,te,proj,mssd,mspd"',
]


def test_rescore_crosscheck_helpers():
    """The step-7 rescore gate compares AR values, not just that a line
    was printed (a CSV mm/m or transpose bug must fail the gate)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "rehearse_protocol",
        os.path.join(REPO, "tools", "rehearse_protocol.py"))
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)

    out = "noise\nBOP19: {'AR_mssd': 0.83, 'AR_mspd': 0.91, 'AR': 0.87}\n"
    ars = rp.parse_bop19_line(out)
    assert ars == {"AR_mssd": 0.83, "AR_mspd": 0.91, "AR": 0.87}
    assert rp.parse_bop19_line("no marker here") == {}

    est = {"AR_mssd": 0.84, "AR_mspd": 0.90, "AR": 0.87, "AR_vsd": 0.5}
    assert rp.rescore_consistent(est, ars)          # within tol, vsd extra
    broken = {"AR_mssd": 0.10, "AR_mspd": 0.91, "AR": 0.50}
    assert not rp.rescore_consistent(est, broken)   # collapsed AR fails
    assert not rp.rescore_consistent(est, {})       # nothing parsed fails


@pytest.mark.slow
def test_rehearse_protocol_chain(tmp_path):
    root = str(tmp_path / "minibop")
    run_dir = str(tmp_path / "run")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "rehearse_protocol.py"),
         "--root", root, "--run", run_dir,
         "--n-train", "8", "--n-test", "4", "--epochs", "10",
         "--platform", "cpu", "--opts", *SMALL_OPTS],
        cwd=REPO, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, \
        proc.stdout[-3000:] + "\n" + proc.stderr[-3000:]

    with open(os.path.join(run_dir, "rehearsal_summary.json")) as f:
        summary = json.load(f)
    # structural gates: the chain produced finite numbers in range
    for k in ("gt_ad_10", "gt_te_2", "est_ad_10"):
        assert 0.0 <= summary[k] <= 100.0, (k, summary)
    assert summary["rescore_ran"]
    assert set(summary["gt_per_obj_ad_10"]) == {"ape", "can", "driller"}
    bop = summary["est_bop19"]
    for k in ("AR_mssd", "AR_mspd", "AR"):
        assert 0.0 <= bop[k] <= 1.0, bop
    # artifacts from every stage
    for f_ in ("gt_bbox.csv", "est_bbox.csv", "metrics_gt_bbox.json",
               "metrics_est_bbox.json", "train_log.txt",
               "rescore_log.txt"):
        assert os.path.exists(os.path.join(run_dir, f_)), f_
    # the BOP CSV is loadable and covers the test targets
    from rdpn6d_tpu.data.inout import load_bop_results_csv

    rows = load_bop_results_csv(os.path.join(run_dir, "gt_bbox.csv"))
    assert len(rows) >= 4
    for r in rows:
        assert np.isfinite(np.asarray(r["R"], np.float64)).all()
        assert r["scene_id"] == 92
