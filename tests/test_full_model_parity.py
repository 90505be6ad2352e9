"""FULL-model forward parity: a torch twin of the reference GDRN/RDPN
forward (flagship configuration, reference state_dict key layout) ->
convert_rdpn_checkpoint -> our assembled RDPN produces the SAME pose.

This is the end-to-end gate VERDICT asked for: per-module parity
(test_checkpoint_parity.py) cannot catch glue bugs — upsample conventions,
gather semantics, attention normalization, pose-recovery algebra. The twin
implements the reference's eval forward from its spec (GDRN.py:107-371,
resnet_backbone.py:264-340, pose_from_pred_centroid_z.py:145-227) at
flagship shapes: ResNet-34, 256^2 input, 64^2 head maps, 32 regions,
L1 coords, mul mask attention, allo_rot6d + centroid/REL-z.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rdpn6d_tpu.config import Config  # noqa: E402
from rdpn6d_tpu.models import RDPN  # noqa: E402
from rdpn6d_tpu.utils.torch_convert import convert_rdpn_checkpoint  # noqa: E402

NUM_REGIONS = 32
FEATDIM = 128


class _BasicBlock(tnn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return F.relu(h + idt)


class _Backbone(tnn.Module):
    """torchvision-keyed ResNet-34 trunk + the reference's spatial_net
    (resnet_backbone.py:264-340; md_pointnet :23-54)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        layers, cin = [3, 4, 6, 3], 64
        for stage, (planes, n) in enumerate(
                zip((64, 128, 256, 512), layers), start=1):
            blocks = []
            for i in range(n):
                stride = 2 if (stage > 1 and i == 0) else 1
                blocks.append(_BasicBlock(cin, planes, stride))
                cin = planes
            setattr(self, f"layer{stage}", tnn.Sequential(*blocks))

        sp = tnn.Module()
        sp.xyz_emb = tnn.Conv2d(512, 64, 1)
        sp.xb = tnn.BatchNorm2d(64)
        sp.conv1 = tnn.Conv2d(67, 128, 1)
        sp.b1 = tnn.BatchNorm2d(128)
        sp.conv2 = tnn.Conv2d(128, 256, 1)
        sp.b2 = tnn.BatchNorm2d(256)
        sp.conv3 = tnn.Conv2d(256, 512, 1)
        sp.b3 = tnn.BatchNorm2d(512)
        self.spatial_net = sp

    def forward(self, x):
        xyz = F.interpolate(x[:, 3:], (32, 32), mode="nearest")
        h = F.relu(self.bn1(self.conv1(x[:, :3])))
        h = self.maxpool(h)
        h = self.layer4(self.layer3(self.layer2(self.layer1(h))))
        h = F.interpolate(h, scale_factor=4, mode="bilinear",
                          align_corners=True)
        sp = self.spatial_net
        emb = F.relu(sp.xb(sp.xyz_emb(h)))
        e = torch.cat([xyz, emb], 1)
        l1 = F.relu(sp.b1(sp.conv1(e)))
        l2 = F.relu(sp.b2(sp.conv2(l1)))
        l3 = sp.b3(sp.conv3(l2))
        gl = torch.amax(l3, dim=(2, 3), keepdim=True).expand_as(l3)
        return torch.cat([l3, gl], 1)  # [B,1024,32,32]


class _TorchRDPN(tnn.Module):
    """Reference-forward twin with reference state_dict keys."""

    def __init__(self):
        super().__init__()
        self.backbone = _Backbone()

        head = tnn.Module()
        hf = 256
        layers = [tnn.ConvTranspose2d(1024, hf, 3, stride=2, padding=1,
                                      output_padding=1, bias=False),
                  tnn.BatchNorm2d(hf), tnn.ReLU()]
        for _ in range(6):
            layers += [tnn.Conv2d(hf, hf, 3, padding=1, bias=False),
                       tnn.BatchNorm2d(hf), tnn.ReLU()]
        layers.append(tnn.Conv2d(hf, 1 + 3 + NUM_REGIONS + 1, 1))
        head.features = tnn.Sequential(*layers)
        self.rot_head_net = head

        pnp = tnn.Module()
        nin = 3 + 5 + 3 + NUM_REGIONS  # coords+coord2d+region_fps+region
        p_layers = []
        for i in range(3):
            p_layers += [tnn.Conv2d(nin if i == 0 else FEATDIM, FEATDIM, 3,
                                    stride=2, padding=1, bias=False),
                         tnn.GroupNorm(32, FEATDIM), tnn.ReLU()]
        pnp.features = tnn.Sequential(*p_layers)
        pnp.fc1 = tnn.Linear(FEATDIM * 8 * 8, 1024)
        pnp.fc2 = tnn.Linear(1024, 256)
        pnp.fc_r = tnn.Linear(256, 6)
        pnp.fc_t = tnn.Linear(256, 3)
        self.pnp_net = pnp

    def forward(self, roi_img, roi_coord_2d, fps, K, bbox_center, roi_wh,
                resize_ratio):
        fused = self.backbone(roi_img)
        out = self.rot_head_net.features(fused)  # [B,37,64,64]
        mask, coord = out[:, :1], out[:, 1:4]
        region = out[:, 4:]

        # PnP assembly (GDRN.py:192-233, L1 path)
        coor_feat = torch.cat([coord, roi_coord_2d], 1)
        region_softmax = F.softmax(region[:, 1:], dim=1)
        rid = torch.argmax(region_softmax, dim=1)          # [B,64,64]
        B = rid.shape[0]
        region_fps = fps[torch.arange(B)[:, None, None].expand_as(rid),
                         rid]                              # [B,64,64,3]
        coor_feat = torch.cat([coor_feat,
                               region_fps.permute(0, 3, 1, 2)], 1)
        # min-max mask prob (model_utils.py:24-42, L1)
        mn = mask.amin(dim=(1, 2, 3), keepdim=True)
        mx = mask.amax(dim=(1, 2, 3), keepdim=True)
        mask_atten = (mask - mn) / (mx - mn)

        x = torch.cat([coor_feat, region_softmax], 1) * mask_atten
        x = self.pnp_net.features(x)
        x = x.reshape(B, -1)
        x = F.leaky_relu(self.pnp_net.fc1(x), 0.1)
        x = F.leaky_relu(self.pnp_net.fc2(x), 0.1)
        rot6d = self.pnp_net.fc_r(x)
        t_param = self.pnp_net.fc_t(x)

        # ortho6d -> mat (rot_reps.py:34-49)
        xr, yr = rot6d[:, :3], rot6d[:, 3:]
        xn = F.normalize(xr, dim=1)
        z = F.normalize(torch.cross(xn, yr, dim=1), dim=1)
        y = torch.cross(z, xn, dim=1)
        rot_allo = torch.stack([xn, y, z], dim=2)

        # pose_from_predictions_train (pose_from_pred_centroid_z.py:145-227)
        cx = t_param[:, 0:1] * roi_wh[:, 0:1] + bbox_center[:, 0:1]
        cy = t_param[:, 1:2] * roi_wh[:, 1:2] + bbox_center[:, 1:2]
        z = t_param[:, 2:3] * resize_ratio.reshape(-1, 1)
        trans = torch.cat([z * (cx - K[:, 0:1, 2]) / K[:, 0:1, 0],
                           z * (cy - K[:, 1:2, 2]) / K[:, 1:2, 1], z], 1)

        # allo -> ego (utils.py:208-242)
        eps = 1e-4
        obj_ray = trans / (trans.norm(dim=1, keepdim=True) + eps)
        angle = obj_ray[:, 2:3].acos()
        cam_ray = torch.tensor([0.0, 0.0, 1.0]).expand_as(obj_ray)
        axis = torch.cross(cam_ray, obj_ray, dim=1)
        axis = axis / (axis.norm(dim=1, keepdim=True) + eps)
        q = torch.cat([torch.cos(angle / 2), axis * torch.sin(angle / 2)],
                      1)
        w, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        R_ae = torch.stack([
            1 - 2 * (qy ** 2 + qz ** 2), 2 * (qx * qy - w * qz),
            2 * (qx * qz + w * qy),
            2 * (qx * qy + w * qz), 1 - 2 * (qx ** 2 + qz ** 2),
            2 * (qy * qz - w * qx),
            2 * (qx * qz - w * qy), 2 * (qy * qz + w * qx),
            1 - 2 * (qx ** 2 + qy ** 2)], dim=1).reshape(-1, 3, 3)
        rot_ego = R_ae @ rot_allo
        return {"mask": mask, "coord": coord, "region": region,
                "rot6d": rot6d, "t_param": t_param,
                "rot_ego": rot_ego, "trans": trans}


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(3)
    m = _TorchRDPN()
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.7, 1.3)
    # bias z_rel into the physical regime (z ~ 1 m): random weights would
    # put the object millimeters from / behind the camera, where the
    # reference's eps-biased acos allo->ego form is ill-defined
    m.pnp_net.fc_t.bias.data[2] = 2.0
    m.eval()
    return m


def test_full_model_parity(twin):
    B = 2
    rng = np.random.RandomState(0)
    roi_img = rng.randn(B, 6, 256, 256).astype(np.float32) * 0.3
    roi_coord_2d = rng.randn(B, 5, 64, 64).astype(np.float32) * 0.3
    fps = rng.randn(B, NUM_REGIONS, 3).astype(np.float32) * 0.05
    K = np.tile(np.array([[572.4, 0, 325.3], [0, 573.6, 242.0],
                          [0, 0, 1.0]], np.float32), (B, 1, 1))
    bbox_center = np.array([[320.0, 240.0], [300.0, 200.0]], np.float32)
    roi_wh = np.array([[128.0, 96.0], [160.0, 120.0]], np.float32)
    resize_ratio = np.array([0.5, 0.4], np.float32)

    with torch.no_grad():
        ref = twin(torch.from_numpy(roi_img),
                   torch.from_numpy(roi_coord_2d),
                   torch.from_numpy(fps), torch.from_numpy(K),
                   torch.from_numpy(bbox_center),
                   torch.from_numpy(roi_wh),
                   torch.from_numpy(resize_ratio))

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, stats = convert_rdpn_checkpoint(sd, depth=34, head_convs=6)

    cfg = Config()  # flagship defaults: resnet34 / 256 / 64 / 32 regions
    assert cfg.backbone.depth == 34 and cfg.head.num_regions == NUM_REGIONS
    model = RDPN(cfg, dtype=jnp.float32)
    batch = {
        "roi_cls": jnp.zeros((B,), jnp.int32),
        "roi_img": jnp.asarray(roi_img.transpose(0, 2, 3, 1)),
        "roi_coord_2d": jnp.asarray(roi_coord_2d.transpose(0, 2, 3, 1)),
        "fps": jnp.asarray(fps),
        "roi_extent": jnp.ones((B, 3), jnp.float32),
        "roi_cam": jnp.asarray(K),
        "bbox_center": jnp.asarray(bbox_center),
        "roi_wh": jnp.asarray(roi_wh),
        "resize_ratio": jnp.asarray(resize_ratio),
    }
    out = model.apply({"params": params, "batch_stats": stats}, batch,
                      train=False)

    # dense-head maps
    np.testing.assert_allclose(
        np.asarray(out["mask_logits"]).transpose(0, 3, 1, 2),
        ref["mask"].numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out["coord"]).transpose(0, 3, 1, 2),
        ref["coord"].numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out["region_logits"]).transpose(0, 3, 1, 2),
        ref["region"].numpy(), atol=5e-4)
    # pnp regression params
    np.testing.assert_allclose(np.asarray(out["rot_param"]),
                               ref["rot6d"].numpy(), atol=5e-4)
    # final pose. Rotation is compared by geodesic angle: our allo->ego
    # correction is the exact branchless Rodrigues form while the
    # reference feeds a (1-1e-4)-shrunk ray into acos (utils.py:208-242),
    # inflating the correction angle by ~eps/sin(theta) — ~0.3 deg for a
    # near-centered object like this fixture. A deliberate numerical
    # improvement on our side; bounded here to stay metrically irrelevant
    # (re recall thresholds are 2 deg).
    R_ours = np.asarray(out["rot_ego"])
    R_ref = ref["rot_ego"].numpy()
    tr = np.einsum("bij,bij->b", R_ours, R_ref)
    ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
    assert ang.max() < 0.5, ang
    np.testing.assert_allclose(np.asarray(out["trans"]),
                               ref["trans"].numpy(), rtol=1e-3, atol=1e-4)
