"""RDPN top module: backbone -> fusion -> dense head -> Patch-PnP -> pose.

Counterpart of the reference's ``GDRN`` module (models/GDRN.py:107-371), as a
single jit-compiled function of fixed-shape batches. Differences by design:

  * NHWC layout, bf16-policy compute, f32 logits/poses.
  * Pose recovery (centroid/z + allo->ego) stays ON-DEVICE and identical in
    train and test — the reference detours through per-sample numpy at test
    (pose_from_pred_centroid_z.py:110-141).
  * The region->FPS gather (GDRN.py:206-218) is a take_along_axis.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..geometry import ortho6d_to_mat, quat_to_mat, recover_pose_centroid_z
from ..ops.binning import expected_coord_from_bins
from ..ops.region import gather_region_fps
from ..ops.resize import (
    downsample_nearest_torch,
    upsample_bilinear_align_corners,
)
from .conv_pnp import ConvPnPNet
from .heads import DenseHead
from .pointnet import SpatialPointNet
from .resnet import ResNetTrunk


class RDPN(nn.Module):
    """Flagship dense point-wise pose network."""

    cfg: Config
    dtype: Any = jnp.bfloat16
    int8: Any = False               # W8A8 serving mode (models/quant.py):
    # False | True/"all" | "trunk" | "head" | "trunk0".."trunk3" (one
    # trunk stage only — per-stage sensitivity attribution, PERF.md
    # round 4). Same param tree as the bf16 model, so bf16-trained
    # checkpoints serve in int8 directly.
    int8_static: Any = False        # False | True | "per_channel"
    # (models/quant.calibrate_quant): removes the per-conv dynamic absmax
    # reductions that block XLA fusion in dynamic mode

    @property
    def _int8_trunk(self) -> bool:
        return self.int8 in (True, "all", "trunk") \
            or self._trunk_stage_mask is not None

    @property
    def _trunk_stage_mask(self):
        """('trunkN' mode) 4-bool stage mask quantizing only stage N."""
        if isinstance(self.int8, str) and len(self.int8) == 6 \
                and self.int8.startswith("trunk") and self.int8[5].isdigit():
            n = int(self.int8[5])
            if n > 3:
                # an all-False mask would silently quantize NOTHING
                # while reporting itself as int8-trunkN
                raise ValueError(
                    f"int8={self.int8!r}: trunk stages are trunk0..trunk3")
            return tuple(s == n for s in range(4))
        return None

    @property
    def _int8_head(self) -> bool:
        return self.int8 in (True, "all", "head")

    @nn.compact
    def __call__(self, batch: dict[str, jax.Array], train: bool = False,
                 drop_scale=1.0):
        cfg = self.cfg
        if self.int8 not in (False, "", True, "all", "head", "trunk") \
                and self._trunk_stage_mask is None:
            # an unrecognized mode would silently serve full precision
            # while logs/CSVs attribute the numbers to int8
            raise ValueError(
                f"int8={self.int8!r}: expected False|True|'all'|'head'|"
                "'trunk'|'trunk0'..'trunk3'")
        head_cfg, pnp_cfg = cfg.head, cfg.pnp
        roi_img = batch["roi_img"]          # [B, 256, 256, 6] rgb+depth_xyz
        rgb = roi_img[..., :3].astype(self.dtype)
        depth_xyz = roi_img[..., 3:6]

        # trunk on RGB; XYZ joins at 32x32 via the pointnet fusion
        # solver.remat: lifted jax.checkpoint around the FLOPs-heavy
        # modules — activations are recomputed in the backward pass
        # instead of stored, roughly halving train memory (nn.remat
        # preserves the parameter tree, so checkpoints interchange)
        trunk_cls = nn.remat(ResNetTrunk, static_argnums=(2, 3)) \
            if cfg.solver.remat else ResNetTrunk
        trunk = trunk_cls(cfg.backbone.depth, dtype=self.dtype,
                          int8=self._int8_trunk,
                          int8_static=self.int8_static,
                          int8_stages=self._trunk_stage_mask,
                          s2d_stem=cfg.backbone.space_to_depth,
                          name="backbone")
        # train/return_skips positional: static under nn.remat
        if cfg.backbone.rot_concat:
            feat, skips = trunk(rgb, train, True)
            skip64, skip32 = skips[0], skips[1]  # [B,64,64,*], [B,32,32,*]
        else:
            feat = trunk(rgb, train, False)                     # [B,8,8,512]
            skip64 = skip32 = None
        if cfg.backbone.freeze:  # frozen-backbone option (GDRN FREEZE)
            feat = jax.lax.stop_gradient(feat)
            skip64 = None if skip64 is None else jax.lax.stop_gradient(skip64)
            skip32 = None if skip32 is None else jax.lax.stop_gradient(skip32)
        B, h8, w8 = feat.shape[:3]
        feat8 = feat  # the 8x8 backbone feature (TransHead input)
        # torch-exact resizes (reference: UpsamplingBilinear2d x4 +
        # F.interpolate nearest to 32x32, resnet_backbone.py:281,307)
        feat = upsample_bilinear_align_corners(feat, h8 * 4, w8 * 4)
        xyz32 = downsample_nearest_torch(
            depth_xyz, h8 * 4, w8 * 4).astype(self.dtype)
        fused = SpatialPointNet(dtype=self.dtype, name="spatial_net")(
            feat, xyz32, train=train)                            # [B,32,32,1024]
        if skip32 is not None:
            fused = jnp.concatenate([fused, skip32.astype(fused.dtype)],
                                    axis=-1)

        nc = head_cfg.num_classes
        head_cls = nn.remat(DenseHead, static_argnums=(2,)) \
            if cfg.solver.remat else DenseHead
        mask_logits, coord_out, region_logits = head_cls(
            mask_dim=head_cfg.mask_dim * (nc if head_cfg.mask_class_aware
                                          else 1),
            coord_dim=head_cfg.coord_dim * (nc if head_cfg.rot_class_aware
                                            else 1),
            region_dim=head_cfg.region_dim * (
                nc if head_cfg.region_class_aware else 1),
            num_filters=head_cfg.num_filters,
            num_layers=head_cfg.num_layers,
            norm=head_cfg.norm,
            gn_groups=head_cfg.gn_groups,
            dtype=self.dtype,
            int8=self._int8_head,
            int8_static=self.int8_static,
            init_mode=head_cfg.init,
            name="dense_head",
            # train is positional: under nn.remat it must be a STATIC
            # argument (it selects batch-norm mode)
        )(fused, train, skip64=skip64)

        # class-aware channel selection (GDRN.py:166-190)
        def select_class(x, dim):
            B = x.shape[0]
            xr = x.reshape(x.shape[:-1] + (nc, dim))
            cls = batch["roi_cls"].reshape(B, 1, 1, 1, 1)
            return jnp.take_along_axis(
                xr, jnp.broadcast_to(cls, xr.shape[:-2] + (1, dim)),
                axis=-2)[..., 0, :]

        if head_cfg.rot_class_aware:
            coord_out = select_class(coord_out, head_cfg.coord_dim)
        if head_cfg.mask_class_aware:
            mask_logits = select_class(mask_logits, head_cfg.mask_dim)
        if head_cfg.region_class_aware:
            region_logits = select_class(region_logits, head_cfg.region_dim)

        # ------------------------------------------------------------------
        # assemble Patch-PnP input (GDRN.py:192-233)
        if head_cfg.xyz_loss == "CE_coor":
            nb = head_cfg.xyz_bin
            lx = coord_out[..., 0 * (nb + 1): 1 * (nb + 1)]
            ly = coord_out[..., 1 * (nb + 1): 2 * (nb + 1)]
            lz = coord_out[..., 2 * (nb + 1): 3 * (nb + 1)]
            coord3 = jnp.stack([
                expected_coord_from_bins(lx, nb),
                expected_coord_from_bins(ly, nb),
                expected_coord_from_bins(lz, nb),
            ], axis=-1)
        else:
            coord3 = coord_out  # [B, 64, 64, 3] normalized residual coords

        feats = [coord3]
        if pnp_cfg.with_2d_coord:
            feats.append(batch["roi_coord_2d"])  # [B,64,64,5] dxyz/4 + uv

        # argmax over logits == argmax over softmax, and the [B,H,W,K]
        # softmax itself is only needed when it feeds region attention
        region_ids = jnp.argmax(region_logits[..., 1:], axis=-1)  # [B,64,64]
        region_fps = gather_region_fps(batch["fps"], region_ids)
        feats.append(region_fps)

        coord_feat = jnp.concatenate(feats, axis=-1)

        mask_atten = mask_concat = None
        if pnp_cfg.mask_attention == "mul":
            mask_atten = _mask_prob(mask_logits, head_cfg.mask_loss)
        elif pnp_cfg.mask_attention == "concat":
            # appended INSIDE the PnP net after region, preserving the
            # reference's [coor_feat, region, mask] channel order (a
            # pre-concat here would permute converted-checkpoint weights)
            mask_concat = _mask_prob(mask_logits, head_cfg.mask_loss)

        region_atten = jax.nn.softmax(region_logits[..., 1:], axis=-1) \
            if pnp_cfg.region_attention else None

        if pnp_cfg.pnp_head == "ConvPnPNet":
            pnp_net = ConvPnPNet(
                rot_dim=pnp_cfg.rot_dim, featdim=pnp_cfg.featdim,
                num_layers=pnp_cfg.num_layers, gn_groups=pnp_cfg.gn_groups,
                norm=pnp_cfg.norm, drop_prob=pnp_cfg.drop_prob,
                init_mode=head_cfg.init, dtype=self.dtype, name="pnp_net")
        elif pnp_cfg.pnp_head == "SimplePointPnP":
            from .point_pnp import SimplePointPnP
            pnp_net = SimplePointPnP(rot_dim=pnp_cfg.rot_dim,
                                     dtype=self.dtype, name="pnp_net")
        elif pnp_cfg.pnp_head == "PointPnP":
            from .point_pnp import PointPnP
            pnp_net = PointPnP(rot_dim=pnp_cfg.rot_dim,
                               num_regions=head_cfg.num_regions,
                               dtype=self.dtype, name="pnp_net")
        else:
            raise ValueError(pnp_cfg.pnp_head)
        pnp_kwargs = {"drop_scale": drop_scale} \
            if pnp_cfg.pnp_head == "ConvPnPNet" else {}
        if pnp_cfg.pnp_head == "ConvPnPNet":
            pnp_kwargs["mask_concat"] = mask_concat
        elif mask_concat is not None:
            # point heads have no spatial concat slot; fold via channels
            coord_feat = jnp.concatenate([coord_feat, mask_concat], -1)
        rot_param, t_param = pnp_net(
            coord_feat, region=region_atten, extents=batch["roi_extent"],
            mask_attention=mask_atten, train=train, **pnp_kwargs)

        if pnp_cfg.r_only:
            # direct-translation head override (GDRN.py:238-239; disabled in
            # all shipped configs but part of the API surface)
            from .heads import TransHead
            # the reference's TransHeadNet consumes the 8x8 BACKBONE
            # feature (cdpn_trans_head.py:39 Linear(256*8*8, 4096)); the
            # 32x32 fused map would blow the first Dense up to ~1e9 params
            t_param = TransHead(num_filters=head_cfg.num_filters,
                                dtype=self.dtype, init_mode=head_cfg.init,
                                name="trans_head")(feat8, train=train)

        # ------------------------------------------------------------------
        # rot param -> matrix; centroid/z -> egocentric pose (on-device)
        # (all four reference parameterizations: GDRN.py:244-252)
        if "rot6d" in pnp_cfg.rot_type:
            rot_m = ortho6d_to_mat(rot_param)
        elif "log_quat" in pnp_cfg.rot_type:
            # qexp of a log-quaternion (quaternion_lf.qexp)
            v = rot_param[:, 1:4]
            n = jnp.linalg.norm(v, axis=-1, keepdims=True)
            q = jnp.concatenate(
                [jnp.cos(n), v * jnp.sinc(n / jnp.pi)], axis=-1)
            rot_m = quat_to_mat(jnp.exp(rot_param[:, :1]) * q)
        elif "lie_vec" in pnp_cfg.rot_type:
            from ..geometry import exp_map
            rot_m = exp_map(rot_param[:, :3])
        else:
            rot_m = quat_to_mat(rot_param)

        rot_ego, trans = recover_pose_centroid_z(
            rot_m,
            centroid_rel=t_param[:, :2],
            z_rel=t_param[:, 2],
            K=batch["roi_cam"],
            bbox_center=batch["bbox_center"],
            bbox_wh=batch["roi_wh"],
            resize_ratio=batch["resize_ratio"],
            z_type=pnp_cfg.z_type,
            is_allo=pnp_cfg.is_allo,
        )

        out_extra = {}
        if cfg.loss.use_mtl:
            # uncertainty multi-task weighting params (GDRN.py:76-105):
            # loss_i * exp(-s_i) + s_i with s_i = log sigma_i^2
            for name in ("mask", "coor_x", "coor_y", "coor_z", "region"):
                out_extra[f"log_var_{name}"] = self.param(
                    f"log_var_{name}", nn.initializers.zeros, (1,))[0]

        return {
            **out_extra,
            "mask_logits": mask_logits,       # [B,64,64,Dm]
            "coord": coord3,                  # [B,64,64,3]
            "coord_out": coord_out,           # raw (bins if CE mode)
            "region_logits": region_logits,   # [B,64,64,K+1]
            "rot_param": rot_param,
            "rot_mat": rot_m,                 # allocentric (or ego) as regressed
            "centroid_rel": t_param[:, :2],
            "z_rel": t_param[:, 2],
            "rot_ego": rot_ego,               # [B,3,3]
            "trans": trans,                   # [B,3]
        }


def _mask_prob(mask_logits: jax.Array, mask_loss: str) -> jax.Array:
    """Visibility probability map from head output
    (model_utils.py:24-42)."""
    if mask_loss == "L1":
        # per-sample min-max normalization to [0,1] (get_mask_prob L1)
        m = mask_logits[..., :1]
        mn = jnp.min(m, axis=(1, 2, 3), keepdims=True)
        mx = jnp.max(m, axis=(1, 2, 3), keepdims=True)
        return (m - mn) / jnp.maximum(mx - mn, 1e-12)
    if mask_loss == "BCE":
        return jax.nn.sigmoid(mask_logits[..., :1])
    if mask_loss == "CE":
        return jax.nn.softmax(mask_logits, axis=-1)[..., 1:2]
    raise ValueError(mask_loss)


def init_model(cfg: Config, rng: jax.Array, batch_size: int = 2,
               dtype: Any = jnp.bfloat16):
    """Initialize model + variables with a dummy batch."""
    model = RDPN(cfg, dtype=dtype)
    batch = dummy_batch(cfg, batch_size)
    variables = model.init(rng, batch, train=False)
    return model, variables


def dummy_batch(cfg: Config, batch_size: int = 2) -> dict[str, jax.Array]:
    """Minimal correctly-shaped input batch (for init / smoke / bench)."""
    res = cfg.backbone.input_res
    out = cfg.head.out_res
    K = cfg.head.num_regions
    b = batch_size
    return {
        "roi_cls": jnp.zeros((b,), jnp.int32),
        "roi_img": jnp.zeros((b, res, res, 6), jnp.float32),
        "roi_coord_2d": jnp.zeros((b, out, out, 5), jnp.float32),
        "fps": jnp.zeros((b, K, 3), jnp.float32),
        "roi_extent": jnp.ones((b, 3), jnp.float32),
        "roi_cam": jnp.tile(jnp.asarray(
            [[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1.0]],
            jnp.float32), (b, 1, 1)),
        "bbox_center": jnp.full((b, 2), 128.0, jnp.float32),
        "roi_wh": jnp.full((b, 2), 128.0, jnp.float32),
        "resize_ratio": jnp.full((b,), out / 128.0, jnp.float32),
    }
