"""Checkpoint-conversion parity: torch modules shaped like the reference's
state_dict -> convert_rdpn_checkpoint -> flax modules produce IDENTICAL
outputs (the gate that makes released reference checkpoints loadable)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rdpn6d_tpu.models.conv_pnp import ConvPnPNet  # noqa: E402
from rdpn6d_tpu.models.heads import DenseHead  # noqa: E402
from rdpn6d_tpu.models.pointnet import SpatialPointNet  # noqa: E402
from rdpn6d_tpu.utils.torch_convert import convert_rdpn_checkpoint  # noqa: E402


class _TorchRig(tnn.Module):
    """Minimal torch modules with the reference's state_dict key layout
    (backbone.spatial_net.*, rot_head_net.features.*, pnp_net.*)."""

    def __init__(self, featdim=16, head_filters=32, pnp_in=43):
        super().__init__()
        backbone = tnn.Module()
        sp = tnn.Module()
        sp.xyz_emb = tnn.Conv2d(512, 64, 1)
        sp.xb = tnn.BatchNorm2d(64)
        sp.conv1 = tnn.Conv2d(67, 128, 1)
        sp.b1 = tnn.BatchNorm2d(128)
        sp.conv2 = tnn.Conv2d(128, 256, 1)
        sp.b2 = tnn.BatchNorm2d(256)
        sp.conv3 = tnn.Conv2d(256, 512, 1)
        sp.b3 = tnn.BatchNorm2d(512)
        backbone.spatial_net = sp
        self.backbone = backbone

        head = tnn.Module()
        layers = [tnn.ConvTranspose2d(1024, head_filters, 3, stride=2,
                                      padding=1, output_padding=1,
                                      bias=False),
                  tnn.BatchNorm2d(head_filters), tnn.ReLU()]
        for _ in range(6):
            layers += [tnn.Conv2d(head_filters, head_filters, 3, padding=1,
                                  bias=False),
                       tnn.BatchNorm2d(head_filters), tnn.ReLU()]
        layers.append(tnn.Conv2d(head_filters, 37, 1))
        head.features = tnn.Sequential(*layers)
        self.rot_head_net = head

        pnp = tnn.Module()
        p_layers = []
        for i in range(3):
            p_layers += [tnn.Conv2d(pnp_in if i == 0 else featdim, featdim,
                                    3, stride=2, padding=1, bias=False),
                         tnn.GroupNorm(8, featdim), tnn.ReLU()]
        pnp.features = tnn.Sequential(*p_layers)
        pnp.fc1 = tnn.Linear(featdim * 8 * 8, 64)
        pnp.fc2 = tnn.Linear(64, 32)
        pnp.fc_r = tnn.Linear(32, 6)
        pnp.fc_t = tnn.Linear(32, 3)
        self.pnp_net = pnp


@pytest.fixture(scope="module")
def rig():
    torch.manual_seed(0)
    rig = _TorchRig()
    # randomize BN running stats so eval-mode BN is a real check
    for m in rig.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    rig.eval()
    return rig


@pytest.fixture(scope="module")
def converted(rig):
    sd = {k: v.detach().numpy() for k, v in rig.state_dict().items()}
    params, stats = convert_rdpn_checkpoint(sd, depth=34, head_convs=6)
    return params, stats


def test_spatial_net_parity(rig, converted):
    params, stats = converted
    x = torch.randn(2, 512, 16, 16)
    xyz = torch.randn(2, 3, 16, 16)
    sp = rig.backbone.spatial_net
    with torch.no_grad():
        emb = F.relu(sp.xb(sp.xyz_emb(x)))
        h = torch.cat([xyz, emb], 1)
        h = F.relu(sp.b1(sp.conv1(h)))
        h = F.relu(sp.b2(sp.conv2(h)))
        l3 = sp.b3(sp.conv3(h))
        gl = torch.amax(l3, dim=(2, 3), keepdim=True).expand_as(l3)
        ref = torch.cat([l3, gl], 1).numpy()

    flax_mod = SpatialPointNet(dtype=jnp.float32)
    out = flax_mod.apply(
        {"params": params["spatial_net"],
         "batch_stats": stats["spatial_net"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(xyz.numpy().transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-4)


def test_dense_head_parity(rig, converted):
    params, stats = converted
    x = torch.randn(2, 1024, 8, 8)
    with torch.no_grad():
        ref = rig.rot_head_net.features(x).numpy()  # [2, 37, 16, 16]

    head = DenseHead(mask_dim=1, coord_dim=3, region_dim=33,
                     num_filters=32, num_layers=3, dtype=jnp.float32)
    mask, coord, region = head.apply(
        {"params": params["dense_head"],
         "batch_stats": stats["dense_head"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    ours = np.concatenate([np.asarray(mask), np.asarray(coord),
                           np.asarray(region)], -1).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_pnp_net_parity(rig, converted):
    params, _ = converted
    x = torch.randn(2, 43, 64, 64)
    pnp = rig.pnp_net
    with torch.no_grad():
        h = pnp.features(x)
        h = h.view(2, -1)
        h = F.leaky_relu(pnp.fc1(h), 0.1)
        h = F.leaky_relu(pnp.fc2(h), 0.1)
        rot_ref = pnp.fc_r(h).numpy()
        t_ref = pnp.fc_t(h).numpy()

    flax_pnp = ConvPnPNet(rot_dim=6, featdim=16, gn_groups=8,
                          fc1_dim=64, fc2_dim=32,
                          denorm_coords_by_extent=False,
                          dtype=jnp.float32)
    rot, t = flax_pnp.apply(
        {"params": params["pnp_net"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(rot), rot_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(t), t_ref, atol=2e-4)
