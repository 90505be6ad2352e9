"""Predictor serving API smoke: frames + detections -> poses."""

import jax.numpy as jnp
import numpy as np

from rdpn6d_tpu.config import Config
from rdpn6d_tpu.data.assets import synthetic_class_assets
from rdpn6d_tpu.engine.predictor import Detection, Predictor


def test_predictor_smoke():
    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16",
    ])
    assets = synthetic_class_assets(num_regions=4)
    pred = Predictor(cfg, assets, batch_size=4, dtype=jnp.float32,
                     allow_random_init=True)

    rng = np.random.RandomState(0)
    rgb = rng.rand(480, 640, 3).astype(np.float32) * 255
    depth = np.full((480, 640), 0.8, np.float32)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float32)
    dets = [Detection(obj_id=1, bbox_xyxy=np.array([200, 150, 330, 280.0]),
                      score=0.9),
            Detection(obj_id=1, bbox_xyxy=np.array([300, 200, 420, 320.0]),
                      score=0.8)]
    out = pred.predict(rgb, depth, K, dets)
    assert len(out) == 2
    for r in out:
        assert r["R"].shape == (3, 3) and r["t"].shape == (3,)
        assert np.isfinite(r["R"]).all() and np.isfinite(r["t"]).all()
    assert pred.predict(rgb, depth, K, []) == []


def test_predictor_refuses_random_init(tmp_path):
    """No checkpoint + no params_pkl must raise, and an empty ckpt_dir must
    raise — never silently serve PRNG-initialized weights (round-2 fix)."""
    import pytest

    from rdpn6d_tpu.config import Config
    from rdpn6d_tpu.engine.predictor import Predictor

    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16"])
    assets = synthetic_class_assets(num_regions=4)
    with pytest.raises(ValueError, match="random-init"):
        Predictor(cfg, assets, batch_size=2, dtype=jnp.float32)
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        Predictor(cfg, assets, ckpt_dir=str(tmp_path / "empty"),
                  batch_size=2, dtype=jnp.float32)


def test_predictor_int8_static_serving():
    """int8 static mode: first served batch calibrates, later batches
    serve with locked scales; poses stay close to the bf16 path."""
    opts = [
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16",
    ]
    cfg = Config().apply_opts(opts)
    cfg_q = Config().apply_opts(opts + ['test.int8="head"',
                                        "test.int8_static=true"])
    assets = synthetic_class_assets(num_regions=4)
    pred = Predictor(cfg, assets, batch_size=4, dtype=jnp.float32,
                     allow_random_init=True)
    pred_q = Predictor(cfg_q, assets, batch_size=4, dtype=jnp.float32,
                       allow_random_init=True)

    rng = np.random.RandomState(0)
    rgb = rng.rand(480, 640, 3).astype(np.float32) * 255
    depth = np.full((480, 640), 0.8, np.float32)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float32)
    dets = [Detection(obj_id=1,
                      bbox_xyxy=np.array([200, 150, 330, 280.0]))]
    out = pred.predict(rgb, depth, K, dets)
    out_q = pred_q.predict(rgb, depth, K, dets)     # calibrates here
    assert not pred_q._needs_calibration
    out_q2 = pred_q.predict(rgb, depth, K, dets)    # locked scales
    # same random weights either way (same init seed): int8 error bounded
    assert np.abs(out_q[0]["t"] - out[0]["t"]).max() < 0.05
    np.testing.assert_allclose(out_q2[0]["t"], out_q[0]["t"], atol=1e-6)
    assert np.isfinite(out_q[0]["R"]).all()


def test_predictor_restores_trainer_checkpoint(tmp_path):
    """A trainer-saved checkpoint carries the FULL optimizer state tree;
    the Predictor must restore it (round-3 fix: an optax.identity()
    template made orbax raise a tree-structure mismatch on every real
    checkpoint, so the deployment entry point could never serve one)."""
    import jax

    from rdpn6d_tpu.engine.checkpoint import CheckpointManager
    from rdpn6d_tpu.models import RDPN, dummy_batch
    from rdpn6d_tpu.parallel import create_train_state
    from rdpn6d_tpu.solver import build_optimizer

    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32",
        "data.input_res=64", "data.out_res=16", "solver.optimizer=ranger"])
    model = RDPN(cfg, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(7), dummy_batch(cfg, 2),
                           train=False)
    state = create_train_state(cfg, variables,
                               build_optimizer(cfg, total_iters=10))
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(3, state)
    mgr.wait() if hasattr(mgr, "wait") else None

    assets = synthetic_class_assets(num_regions=4)
    pred = Predictor(cfg, assets, ckpt_dir=ckpt_dir, batch_size=2,
                     dtype=jnp.float32)
    # served params are the checkpoint's, not random re-init
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(pred.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
