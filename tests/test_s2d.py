"""Space-to-depth stem (backbone.space_to_depth): exact equivalence.

The s2d stem is a performance rewrite of the 7x7/s2 stem conv
(PERF.md round 4: the thin 3-channel 256^2 stem pins the trunk at
15-20% MFU), NOT an architecture change — conv7x7/s2(pad 3) and
s2d(2)+conv4x4/s1(pad (2,1)) with the remapped kernel must agree to
float tolerance on every pixel including the zero-padded borders, and
pretrained torchvision checkpoints must load into either form.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from rdpn6d_tpu.models.resnet import (  # noqa: E402
    ResNetTrunk,
    space_to_depth,
    stem_kernel_to_s2d,
)


def test_s2d_transform_layout():
    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    y = np.asarray(space_to_depth(jnp.asarray(x), 2))
    assert y.shape == (2, 2, 2, 12)
    # channel index = (di*2+dj)*C + c
    for di in range(2):
        for dj in range(2):
            for c in range(3):
                np.testing.assert_array_equal(
                    y[:, 0, 0, (di * 2 + dj) * 3 + c], x[:, di, dj, c])


def test_s2d_stem_exact_equivalence():
    """Full trunk forward: 7x7 stem vs s2d stem with the remapped kernel."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))

    base = ResNetTrunk(depth=18, dtype=jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x, train=False)

    s2d = ResNetTrunk(depth=18, dtype=jnp.float32, s2d_stem=True)
    v2 = s2d.init(jax.random.PRNGKey(1), x, train=False)
    assert v2["params"]["Conv_0"]["kernel"].shape == (4, 4, 12, 64)

    # graft every base param into the s2d tree, remapping only the stem
    p2 = jax.tree_util.tree_map(lambda a: a, v["params"])
    p2["Conv_0"] = {"kernel": jnp.asarray(
        stem_kernel_to_s2d(v["params"]["Conv_0"]["kernel"]))}
    v2 = {"params": p2, "batch_stats": v["batch_stats"]}

    out = base.apply(v, x, train=False)
    out2 = s2d.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-4, atol=1e-5)

    # and with skips (the rot_concat path)
    o, sk = base.apply(v, x, train=False, return_skips=True)
    o2, sk2 = s2d.apply(v2, x, train=False, return_skips=True)
    for a, b in zip(sk, sk2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pretrained_load_into_s2d_model(tmp_path):
    """A torchvision .pth loads into a space_to_depth model and produces
    the same trunk output as loading it into the 7x7 model."""
    torch = pytest.importorskip("torch")
    from tests.test_torch_convert import synthetic_state_dict
    from rdpn6d_tpu.utils.torch_convert import load_pretrained_backbone

    sd = synthetic_state_dict(18)
    pth = tmp_path / "bb.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(pth))

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))

    outs = []
    for use_s2d in (False, True):
        trunk = ResNetTrunk(depth=18, dtype=jnp.float32, s2d_stem=use_s2d)
        v = trunk.init(jax.random.PRNGKey(2), x, train=False)
        v = {"params": {"backbone": v["params"]},
             "batch_stats": {"backbone": v["batch_stats"]}}
        v = load_pretrained_backbone(v, str(pth), depth=18)
        outs.append(trunk.apply(
            {"params": v["params"]["backbone"],
             "batch_stats": v["batch_stats"]["backbone"]}, x, train=False))
    # different tap-summation order + BN rescale: relative ~3e-6 at the
    # ~1e2 activation magnitudes of the synthetic weights
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               rtol=1e-3, atol=1e-3)
