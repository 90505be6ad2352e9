"""Orbax checkpoint manager: save / restore / resume round-trip."""

import jax.numpy as jnp
import numpy as np

from rdpn6d_tpu.engine.checkpoint import CheckpointManager
from rdpn6d_tpu.parallel.train_step import TrainState


def _state(value: float) -> TrainState:
    return TrainState(
        step=jnp.asarray(3, jnp.int32),
        params={"w": jnp.full((4, 4), value)},
        batch_stats={"bn": {"mean": jnp.zeros(4)}},
        opt_state=(jnp.asarray(1.0),),
    )


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(10, _state(1.5))
    assert mgr.latest_step() == 10

    template = _state(0.0)
    restored, _ = mgr.restore(template)
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 1.5)
    assert int(restored.step) == 3


def test_resume_or_load(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    state, start = mgr.resume_or_load(_state(0.0), resume=True)
    assert start == 0  # nothing to resume
    mgr.save(5, _state(2.0))
    mgr.save(7, _state(3.0))
    state, start = mgr.resume_or_load(_state(0.0), resume=True)
    assert start == 7
    np.testing.assert_allclose(np.asarray(state.params["w"]), 3.0)


def test_max_to_keep(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for s in (1, 2, 3):
        mgr.save(s, _state(float(s)))
    steps = mgr._mgr.all_steps()
    assert sorted(steps) == [2, 3]
def test_nan_on_checkpoint_iteration_refuses_to_save(tmp_path):
    """A NaN landing exactly on a checkpoint iteration (here: the final
    one, which the lag-1 guard never re-checks) must abort BEFORE the
    poisoned state is persisted as the latest checkpoint."""
    import numpy as np
    import pytest

    from rdpn6d_tpu.config import Config
    from rdpn6d_tpu.engine.checkpoint import CheckpointManager
    from rdpn6d_tpu.engine.trainer import Trainer
    from rdpn6d_tpu.engine.writers import ConsoleWriter, MetricBuffer
    from rdpn6d_tpu.parallel import create_mesh

    cfg = Config().apply_opts(
        ["solver.total_epochs=1", "train.log_period=100"])
    t = Trainer.__new__(Trainer)
    t.cfg, t.total_iters, t.mesh = cfg, 4, create_mesh(1)
    t.schedule = lambda it: 1e-4
    t.state = None
    t.is_main = True
    t.ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    t.buf, t.console = MetricBuffer(), ConsoleWriter(4)
    t.json_writer = t.tb = None

    calls = {"n": 0}

    def step(state, batch):
        i = calls["n"]
        calls["n"] += 1
        # finite until the FINAL iteration (a checkpoint iteration)
        return state, {"total_loss": np.float32("nan") if i == 3
                       else np.float32(1.0)}

    t.step_fn = step
    loader = iter({"x": np.zeros((1, 1), np.float32)} for _ in range(4))
    with pytest.raises(FloatingPointError, match="refusing to checkpoint"):
        t.train(loader)
    assert t.ckpt.latest_step() is None  # nothing was persisted
