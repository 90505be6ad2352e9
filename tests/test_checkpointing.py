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
