"""Fused preprocess+train step (data.fused_train_step).

The grouped path can compile preprocessing INTO the train step
(parallel.make_fused_sharded_train_step): one program per iteration, no
jit-boundary relayout copy, preprocess sharded with the model. These
tests pin that the fused program computes THE SAME step as the
two-program path on the virtual 8-device mesh, and that the trainer
dispatches raw grouped batches to it.
"""

import numpy as np
import pytest

from rdpn6d_tpu.config import Config

from tests.test_grouped_train import _flat_and_grouped, multi_instance_ds  # noqa: F401

TINY = ["backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32", "data.input_res=64",
        "data.out_res=16"]


def _grouped_inputs(cfg, records):
    """(frames, rois) device dicts exactly as main.device_batches builds
    them (via the shared _flat_and_grouped helper)."""
    _, _, _, (frames_l, rois_l) = _flat_and_grouped(cfg, records, True)
    import jax.numpy as jnp

    from rdpn6d_tpu.data.loader import _stack

    frames = {k: jnp.asarray(v) for k, v in _stack(frames_l).items()}
    rois = {k: jnp.asarray(v) for k, v in _stack(rois_l).items()}
    return frames, rois


def test_fused_step_matches_two_program_path(multi_instance_ds):  # noqa: F811
    import jax
    import jax.numpy as jnp

    from rdpn6d_tpu.data.pipeline import preprocess_rois_grouped
    from rdpn6d_tpu.models import RDPN
    from rdpn6d_tpu.parallel import (
        create_mesh,
        create_train_state,
        make_fused_sharded_train_step,
        make_sharded_train_step,
        replicate,
        shard_batch,
    )
    from rdpn6d_tpu.solver import build_optimizer

    _, records = multi_instance_ds
    cfg = Config().apply_opts(TINY)
    frames, rois = _grouped_inputs(cfg, records)
    assert rois["frame_idx"].shape[0] == 8  # divisible by the 8-dev mesh

    key = jax.random.PRNGKey(7)
    model = RDPN(cfg, dtype=jnp.float32)
    batch = preprocess_rois_grouped(cfg, frames, rois, key, train=True)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    tx = build_optimizer(cfg, total_iters=10)
    mesh = create_mesh()

    # the step DONATES its state arg, and replicate() is a no-op
    # device_put for already-placed arrays — state_b must not alias
    # state_a's (donated) buffers, so deep-copy variables for it
    vb = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                variables)
    state_a = replicate(create_train_state(cfg, variables, tx), mesh)
    state_b = replicate(create_train_state(cfg, vb, tx), mesh)

    # two-program reference step
    step = make_sharded_train_step(cfg, model, tx, mesh)
    state_a, metrics_a = step(state_a, shard_batch(batch, mesh))

    # fused step, same inputs + SAME key
    fused = make_fused_sharded_train_step(cfg, model, tx, mesh)
    state_b, metrics_b = fused(state_b, frames, rois, key)

    assert set(metrics_a) == set(metrics_b)
    for k in metrics_a:
        a, b = float(metrics_a[k]), float(metrics_b[k])
        assert a == pytest.approx(b, rel=2e-4, abs=2e-5), (k, a, b)
    # the updated parameters agree (one optimizer step, same grads up to
    # compilation-order float noise)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-4, atol=1e-5)


def test_trainer_dispatches_raw_grouped_batches(multi_instance_ds,  # noqa: F811
                                                tmp_path):
    """The Trainer runs raw {frames, rois, key} batches through the fused
    step (and still applies the NaN guard / writers)."""
    import jax
    import jax.numpy as jnp

    from rdpn6d_tpu.data.pipeline import preprocess_rois_grouped
    from rdpn6d_tpu.engine.trainer import Trainer
    from rdpn6d_tpu.models import RDPN

    _, records = multi_instance_ds
    cfg = Config().apply_opts(TINY + [f'train.output_dir="{tmp_path}"',
                                      "train.log_period=1"])
    frames, rois = _grouped_inputs(cfg, records)
    key = jax.random.PRNGKey(7)
    model = RDPN(cfg, dtype=jnp.float32)
    batch0 = preprocess_rois_grouped(cfg, frames, rois, key, train=True)
    variables = model.init(jax.random.PRNGKey(0), batch0, train=False)

    trainer = Trainer(cfg, model, variables, total_iters=2)

    def loader():
        while True:
            yield {"frames": frames, "rois": rois, "key": key}

    state = trainer.train(loader(), start_iter=0)
    assert int(state.step) == 2
    assert trainer._fused_step_fn is not None
