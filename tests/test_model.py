"""Model smoke: shapes, determinism, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdpn6d_tpu.config import Config
from rdpn6d_tpu.models import RDPN, dummy_batch


@pytest.fixture(scope="module")
def small_cfg():
    cfg = Config()
    # tiny backbone input to keep CPU test time sane
    cfg = cfg.apply_opts(["backbone.depth=18", "backbone.input_res=64",
                          "head.out_res=16", "head.num_regions=4",
                          "head.num_filters=32"])
    return cfg


def tiny_batch(cfg, b=2):
    batch = dummy_batch(cfg, b)
    key = jax.random.PRNGKey(0)
    batch["roi_img"] = jax.random.normal(key, batch["roi_img"].shape) * 0.1
    batch["roi_coord_2d"] = jax.random.normal(
        key, (b, cfg.head.out_res, cfg.head.out_res, 5)) * 0.1
    batch["fps"] = jax.random.normal(key, batch["fps"].shape) * 0.05
    return batch


@pytest.fixture(scope="module")
def model_and_vars(small_cfg):
    model = RDPN(small_cfg, dtype=jnp.float32)
    batch = tiny_batch(small_cfg)
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    return model, variables, batch


def test_forward_shapes(small_cfg, model_and_vars):
    model, variables, batch = model_and_vars
    out = model.apply(variables, batch, train=False)
    r = small_cfg.head.out_res
    assert out["mask_logits"].shape == (2, r, r, 1)
    assert out["coord"].shape == (2, r, r, 3)
    assert out["region_logits"].shape == (2, r, r, 5)
    assert out["rot_ego"].shape == (2, 3, 3)
    assert out["trans"].shape == (2, 3)
    # rotation is orthonormal
    eye = np.asarray(out["rot_ego"] @ np.swapaxes(out["rot_ego"], -1, -2))
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (2, 1, 1)), atol=1e-4)


def test_forward_deterministic(model_and_vars):
    model, variables, batch = model_and_vars
    o1 = model.apply(variables, batch, train=False)
    o2 = model.apply(variables, batch, train=False)
    np.testing.assert_array_equal(np.asarray(o1["trans"]),
                                  np.asarray(o2["trans"]))


def test_gradients_flow(model_and_vars):
    model, variables, batch = model_and_vars

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"])
        return jnp.sum(out["trans"] ** 2) + jnp.sum(out["coord"] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least backbone conv and pnp head receive gradient signal
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0.0
