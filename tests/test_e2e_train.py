"""End-to-end slice: synthetic cube scenes -> on-device preprocessing ->
tiny RDPN -> losses decrease under training -> evaluator wiring.

This is the capability the reference validates only with full dataset runs
(SURVEY.md §4); here a fully synthetic closed loop.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdpn6d_tpu.config import Config
from rdpn6d_tpu.data.pipeline import preprocess_batch
from rdpn6d_tpu.data.synthetic import cube_points, render_cube_depth
from rdpn6d_tpu.evaluation import PoseEvaluator
from rdpn6d_tpu.losses import compute_losses
from rdpn6d_tpu.models import RDPN
from rdpn6d_tpu.ops import fps_numpy
from rdpn6d_tpu.parallel import create_train_state, make_eval_step, make_train_step
from rdpn6d_tpu.solver import build_optimizer


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16",
        "solver.optimizer=adamw", "solver.base_lr=0.001",
        "solver.lr_scheduler=flat_and_anneal", "solver.warmup_iters=1",
    ])
    return cfg


@pytest.fixture(scope="module")
def scene_batch(tiny_cfg):
    """4 synthetic cube views through the real preprocessing graph."""
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float32)
    pts = cube_points()
    fps = pts[fps_numpy(pts, tiny_cfg.head.num_regions)]
    rng = np.random.RandomState(0)
    samples = []
    for i in range(4):
        rvec = rng.randn(3) * 0.6
        R = cv2.Rodrigues(rvec)[0].astype(np.float32)
        t = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                      rng.uniform(0.6, 0.9)], np.float32)
        depth, xyz = render_cube_depth(R, t, K, 480, 640)
        mask = (depth > 0).astype(np.float32)
        ys, xs = np.nonzero(mask)
        proj = K @ t
        samples.append({
            "rgb": (np.tile(mask[..., None], (1, 1, 3)) * 200.0
                    + rng.rand(480, 640, 3) * 20).astype(np.float32),
            "depth": depth, "xyz": xyz, "mask_visib": mask,
            "K": K,
            "bbox": np.array([xs.min(), ys.min(), xs.max(), ys.max()],
                             np.float32),
            "gt_rot": R, "gt_trans": t,
            "fps": fps.astype(np.float32),
            "extent": np.array([0.1, 0.1, 0.1], np.float32),
            "centroid_2d": (proj[:2] / proj[2]).astype(np.float32),
        })
    stacked = {k: jnp.asarray(np.stack([s[k] for s in samples]))
               for k in samples[0]}
    batch = preprocess_batch(tiny_cfg, stacked, jax.random.PRNGKey(0),
                             train=True)
    # PM loss inputs
    b = 4
    batch["roi_points"] = jnp.asarray(
        np.tile(pts[rng.choice(len(pts), 64)][None], (b, 1, 1)))
    batch["sym_rots"] = jnp.asarray(
        np.tile(np.eye(3, dtype=np.float32), (b, 1, 1, 1)))
    return batch


def test_train_loss_decreases(tiny_cfg, scene_batch):
    model = RDPN(tiny_cfg, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), scene_batch, train=False)
    tx = build_optimizer(tiny_cfg, total_iters=100)
    state = create_train_state(tiny_cfg, variables, tx)
    step = make_train_step(tiny_cfg, model, tx)

    state, m0 = step(state, scene_batch)
    first = float(m0["total_loss"])
    for _ in range(40):
        state, metrics = step(state, scene_batch)
    last = float(metrics["total_loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < 0.6 * first, (first, last)
    # per-term losses present (reference loss dict keys, GDRN.py:373-633)
    for key in ("loss_coor_x", "loss_mask", "loss_region", "loss_PM_R",
                "loss_centroid", "loss_z"):
        assert key in metrics, sorted(metrics)

    # eval step produces finite poses; evaluator consumes them
    eval_step = make_eval_step(tiny_cfg, model)
    out = eval_step(state, scene_batch)
    assert np.isfinite(np.asarray(out["rot_ego"])).all()
    pts = cube_points()
    ev = PoseEvaluator(models={"cube": pts}, diameters={"cube": 0.17},
                       sym_rots={"cube": None})
    for i in range(4):
        ev.process("cube", np.asarray(out["rot_ego"][i]),
                   np.asarray(out["trans"][i]),
                   np.asarray(scene_batch["gt_rot"][i]),
                   np.asarray(scene_batch["gt_trans"][i]),
                   np.asarray(scene_batch["roi_cam"][i]), im_id=i)
    res = ev.evaluate()
    assert "ad_10" in res["per_obj"]["cube"]
