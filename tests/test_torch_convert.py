"""Torch->flax backbone conversion: structural compatibility + BN parity."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from rdpn6d_tpu.models.resnet import RESNET_SPECS, ResNetTrunk  # noqa: E402
from rdpn6d_tpu.utils.torch_convert import convert_torchvision_resnet  # noqa: E402


def synthetic_state_dict(depth=18, seed=0):
    """Generate a torchvision-shaped ResNet state_dict with random values."""
    rng = np.random.RandomState(seed)
    _, layers = RESNET_SPECS[depth]
    sd = {}

    def add_conv(name, cout, cin, k):
        sd[name] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = np.abs(rng.randn(c).astype(np.float32))
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_var"] = np.abs(
            rng.randn(c).astype(np.float32)) + 0.5

    add_conv("conv1.weight", 64, 3, 7)
    add_bn("bn1", 64)
    cin = 64
    for stage, (planes, n) in enumerate(zip((64, 128, 256, 512), layers),
                                        start=1):
        for i in range(n):
            pre = f"layer{stage}.{i}"
            add_conv(f"{pre}.conv1.weight", planes, cin, 3)
            add_bn(f"{pre}.bn1", planes)
            add_conv(f"{pre}.conv2.weight", planes, planes, 3)
            add_bn(f"{pre}.bn2", planes)
            if cin != planes:
                add_conv(f"{pre}.downsample.0.weight", planes, cin, 1)
                add_bn(f"{pre}.downsample.1", planes)
            cin = planes
    return sd


def test_converted_params_match_flax_structure():
    depth = 18
    sd = synthetic_state_dict(depth)
    params, stats = convert_torchvision_resnet(sd, depth)

    trunk = ResNetTrunk(depth, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = trunk.init(jax.random.PRNGKey(0), x, train=False)

    # every converted leaf must exist in the flax tree with matching shape
    flat_ref = jax.tree_util.tree_leaves_with_path(variables["params"])
    ref_shapes = {jax.tree_util.keystr(p): v.shape for p, v in flat_ref}
    flat_conv = jax.tree_util.tree_leaves_with_path(params)
    for p, v in flat_conv:
        ks = jax.tree_util.keystr(p)
        assert ks in ref_shapes, f"unexpected param {ks}"
        assert ref_shapes[ks] == v.shape, (ks, ref_shapes[ks], v.shape)
    assert len(flat_conv) == len(flat_ref)

    # forward with converted weights runs and differs from random init
    out_conv = trunk.apply({"params": params, "batch_stats": stats}, x,
                           train=False)
    out_rand = trunk.apply(variables, x, train=False)
    assert out_conv.shape == out_rand.shape
    # batch_stats leaves also line up
    flat_stats_ref = jax.tree_util.tree_leaves_with_path(
        variables["batch_stats"])
    flat_stats = jax.tree_util.tree_leaves_with_path(stats)
    assert len(flat_stats) == len(flat_stats_ref)
