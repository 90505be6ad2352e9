"""Loss assembly for the RDPN train step.

Counterpart of ``GDRN.gdrn_loss`` (models/GDRN.py:373-633): coordinate,
mask, region, point-matching, centroid and z losses with config weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from ..geometry import angular_distance
from .dense import mask_loss, masked_coord_ce, masked_coord_l1, region_loss
from .pm_loss import point_matching_loss

__all__ = ["compute_losses", "point_matching_loss", "masked_coord_l1",
           "masked_coord_ce", "mask_loss", "region_loss"]


def compute_losses(cfg: Config, out: dict[str, jax.Array],
                   batch: dict[str, jax.Array]) -> dict[str, jax.Array]:
    """All training losses. ``sum(values)`` is the total objective.

    Expected batch keys (train): roi_xyz [B,H,W,3] (or roi_xyz_bin),
    roi_mask_{trunc,visib,obj} [B,H,W], roi_region [B,H,W],
    gt_rot [B,3,3] (ego), gt_trans [B,3], trans_ratio [B,3],
    roi_points [B,N,3], sym_rots [B,K,3,3], roi_extent [B,3].
    """
    h, l, p = cfg.head, cfg.loss, cfg.pnp
    masks = {"trunc": batch["roi_mask_trunc"],
             "visib": batch["roi_mask_visib"],
             "obj": batch["roi_mask_obj"]}
    losses: dict[str, jax.Array] = {}

    # dense coordinate loss ------------------------------------------------
    xyz_mask = masks[h.xyz_loss_mask]
    if h.xyz_loss == "L1":
        coord = masked_coord_l1(out["coord"], batch["roi_xyz"], xyz_mask)
    elif h.xyz_loss == "CE_coor":
        coord = masked_coord_ce(out["coord_out"], batch["roi_xyz_bin"],
                                xyz_mask, h.xyz_bin)
    else:
        raise ValueError(h.xyz_loss)
    losses.update({k: v * h.xyz_lw for k, v in coord.items()})

    # mask loss ------------------------------------------------------------
    losses["loss_mask"] = mask_loss(
        out["mask_logits"], masks[h.mask_loss_gt], h.mask_loss) * h.mask_lw

    # region loss ----------------------------------------------------------
    reg = region_loss(out["region_logits"], batch["roi_region"],
                      masks[h.region_loss_mask], batch["roi_mask_visib"])
    losses["loss_region"] = reg["loss_region"] * h.region_lw
    losses["loss_region_my"] = reg["loss_region_my"] * h.region_lw

    # point matching -------------------------------------------------------
    if l.pm_lw > 0:
        losses.update(point_matching_loss(
            out["rot_ego"], batch["gt_rot"], batch["roi_points"],
            pred_trans=out["trans"], gt_trans=batch["gt_trans"],
            extents=batch["roi_extent"],
            sym_rots=batch.get("sym_rots"),
            loss_type=l.pm_loss_type, beta=l.pm_smooth_l1_beta,
            norm_by_extent=l.pm_norm_by_extent, symmetric=l.pm_loss_sym,
            r_only=l.pm_r_only, disentangle_t=l.pm_disentangle_t,
            disentangle_z=l.pm_disentangle_z,
            t_use_points=l.pm_t_use_points, loss_weight=l.pm_lw))

    # rot loss -------------------------------------------------------------
    if l.rot_lw > 0:
        if l.rot_loss_type == "angular":
            # eps keeps arccos' gradient finite at cos = +-1
            losses["loss_rot"] = jnp.mean(angular_distance(
                out["rot_ego"], batch["gt_rot"], eps=1e-7)) * l.rot_lw
        else:
            losses["loss_rot"] = jnp.mean(
                (out["rot_ego"] - batch["gt_rot"]) ** 2) * l.rot_lw

    # centroid / z losses (targets = trans_ratio, GDRN.py:555-585) ---------
    if l.centroid_lw > 0 and p.trans_type == "centroid_z":
        losses["loss_centroid"] = jnp.mean(jnp.abs(
            out["centroid_rel"] - batch["trans_ratio"][:, :2])) * l.centroid_lw
    if l.z_lw > 0:
        losses["loss_z"] = jnp.mean(jnp.abs(
            out["z_rel"] - batch["trans_ratio"][:, 2])) * l.z_lw

    # direct translation loss (GDRN.py:586-607)
    if l.trans_lw > 0:
        diff = out["trans"] - batch["gt_trans"]
        if l.trans_loss_disentangle:
            losses["loss_trans_xy"] = jnp.mean(
                jnp.abs(diff[:, :2])) * l.trans_lw
            losses["loss_trans_z"] = jnp.mean(
                jnp.abs(diff[:, 2])) * l.trans_lw
        else:
            losses["loss_trans_LPnP"] = jnp.mean(jnp.abs(diff)) * l.trans_lw

    # bind term: R^T t consistency (GDRN.py:609-624)
    if l.bind_lw > 0:
        bind_pred = jnp.einsum("bij,bi->bj", out["rot_ego"], out["trans"])
        bind_gt = jnp.einsum("bij,bi->bj", batch["gt_rot"],
                             batch["gt_trans"])
        losses["loss_bind"] = jnp.mean(jnp.abs(bind_pred - bind_gt)) \
            * l.bind_lw

    # MTL uncertainty re-weighting (GDRN.py:626-632)
    if l.use_mtl:
        for name in ("mask", "coor_x", "coor_y", "coor_z", "region"):
            key, s = f"loss_{name}", out.get(f"log_var_{name}")
            if key in losses and s is not None:
                losses[key] = losses[key] * jnp.exp(-s) + s

    return losses
