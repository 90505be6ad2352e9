"""Dense-map losses: masked coordinate, mask, and region losses.

Counterpart of the reference's loss assembly in ``GDRN.gdrn_loss``
(models/GDRN.py:373-483) and ``losses/coor_cross_entropy.py``. All reductions
follow the reference exactly: coordinate/region losses are sum-reduced then
divided by the (clamped) foreground-mask pixel count; the mask loss is
mean-reduced over all pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def masked_coord_l1(pred: jax.Array, target: jax.Array,
                    mask: jax.Array) -> dict[str, jax.Array]:
    """Per-axis masked L1. pred/target [B,H,W,3]; mask [B,H,W].

    Returns {loss_coor_x, loss_coor_y, loss_coor_z}, each
    sum(|diff| * mask) / clamp(sum(mask), 1) (GDRN.py:411-425).
    """
    m = mask[..., None]
    denom = jnp.clip(jnp.sum(mask), 1.0, None)
    diff = jnp.abs(pred - target) * m
    return {
        "loss_coor_x": jnp.sum(diff[..., 0]) / denom,
        "loss_coor_y": jnp.sum(diff[..., 1]) / denom,
        "loss_coor_z": jnp.sum(diff[..., 2]) / denom,
    }


def masked_coord_ce(coord_logits: jax.Array, target_bins: jax.Array,
                    mask: jax.Array, num_bins: int) -> dict[str, jax.Array]:
    """Bin-classification coordinate loss (CE_coor mode).

    coord_logits [B,H,W,3*(num_bins+1)]; target_bins [B,H,W,3] int;
    mask [B,H,W]. The reference multiplies logits AND targets by the mask
    (GDRN.py:427-446); masked pixels then contribute a constant that the
    per-pixel CE of a zeroed logit/bg pair yields — we instead zero their
    contribution explicitly, which matches up to that constant and is better
    conditioned.
    """
    denom = jnp.clip(jnp.sum(mask), 1.0, None)
    out = {}
    for i, name in enumerate(["x", "y", "z"]):
        logits = coord_logits[..., i * (num_bins + 1):(i + 1) * (num_bins + 1)]
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, target_bins[..., i])
        out[f"loss_coor_{name}"] = jnp.sum(ce * mask) / denom
    return out


def mask_loss(mask_logits: jax.Array, gt_mask: jax.Array,
              kind: str = "L1") -> jax.Array:
    """mask_logits [B,H,W,Dm]; gt_mask [B,H,W] (GDRN.py:449-464)."""
    if kind == "L1":
        return jnp.mean(jnp.abs(mask_logits[..., 0] - gt_mask))
    if kind == "BCE":
        return jnp.mean(optax.sigmoid_binary_cross_entropy(
            mask_logits[..., 0], gt_mask))
    if kind == "CE":
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            mask_logits, gt_mask.astype(jnp.int32)))
    raise ValueError(kind)


def region_loss(region_logits: jax.Array, gt_region: jax.Array,
                mask: jax.Array, gt_mask_visib: jax.Array
                ) -> dict[str, jax.Array]:
    """Region CE + the RDPN extra L1 binding the bg channel to visibility.

    region_logits [B,H,W,K+1]; gt_region [B,H,W] int in 0..K (0 = bg);
    mask [B,H,W] region-loss mask. Mirrors GDRN.py:467-483 including
    ``loss_region_my`` = L1(visib_mask, region_channel_0) on the RAW
    logit, exactly as the reference (GDRN.py:478 applies no sigmoid).
    Masking: the reference multiplies the LOGITS by the mask, which
    gives identical gradients to masking the per-pixel CE (zeroed logits
    contribute a parameter-independent log(K+1) constant); we mask the
    CE so the logged value excludes that offset.
    """
    denom = jnp.clip(jnp.sum(mask), 1.0, None)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        region_logits, gt_region.astype(jnp.int32))
    return {
        "loss_region": jnp.sum(ce * mask) / denom,
        "loss_region_my": jnp.mean(
            jnp.abs(gt_mask_visib - region_logits[..., 0])),
    }
