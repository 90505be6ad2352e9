"""Point-matching loss with symmetry awareness, fully on-device.

Counterpart of the reference's ``PyPMLoss`` (losses/pm_loss.py:20-173). The
symmetric variant selects, per sample, the symmetry-equivalent GT rotation
closest to the prediction — the reference does this per-sample on the host
(pose_utils.py:458-484); here it is a fixed-shape vmapped argmin over the
identity-padded symmetry bank so the whole loss jits into the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import closest_rot, transform_pts


def _elem_loss(diff: jax.Array, kind: str, beta: float = 1.0) -> jax.Array:
    if kind in ("L1", "l1"):
        return jnp.abs(diff)
    if kind in ("smooth_l1", "Smooth_L1"):
        a = jnp.abs(diff)
        return jnp.where(a < beta, 0.5 * a * a / beta, a - 0.5 * beta)
    if kind in ("mse", "MSE"):
        return diff * diff
    raise ValueError(kind)


def point_matching_loss(
    pred_rots: jax.Array,
    gt_rots: jax.Array,
    points: jax.Array,
    pred_trans: jax.Array | None = None,
    gt_trans: jax.Array | None = None,
    extents: jax.Array | None = None,
    sym_rots: jax.Array | None = None,
    loss_type: str = "L1",
    beta: float = 1.0,
    norm_by_extent: bool = False,
    symmetric: bool = False,
    r_only: bool = True,
    disentangle_t: bool = False,
    disentangle_z: bool = False,
    t_use_points: bool = False,
    loss_weight: float = 1.0,
) -> dict[str, jax.Array]:
    """pred/gt rots [B,3,3]; points [B,N,3]; sym_rots [B,K,3,3] id-padded.

    Returns a dict of named losses; the trailing 3x compensates the mean over
    the point dimension (reference pm_loss.py:172).
    """
    if symmetric:
        assert sym_rots is not None
        gt_rots = closest_rot(pred_rots, gt_rots, sym_rots)

    pts_est = transform_pts(points, pred_rots)
    pts_tgt = transform_pts(points, gt_rots)

    if norm_by_extent:
        assert extents is not None
        w = (1.0 / jnp.max(extents, axis=-1))[:, None, None]
    else:
        w = 1.0

    def red(diff):
        return jnp.mean(_elem_loss(diff, loss_type, beta))

    if r_only:
        return {"loss_PM_R": 3.0 * red(w * (pts_est - pts_tgt)) * loss_weight}

    assert pred_trans is not None and gt_trans is not None
    if disentangle_z:
        if t_use_points:
            tgt = pts_tgt + gt_trans[:, None, :]
            est_R = pts_est + gt_trans[:, None, :]
            t_xy = jnp.concatenate([pred_trans[:, :2], gt_trans[:, 2:]], -1)
            t_z = jnp.concatenate([gt_trans[:, :2], pred_trans[:, 2:]], -1)
            return {
                "loss_PM_R": 3.0 * red(w * (est_R - tgt)) * loss_weight,
                "loss_PM_xy": 3.0 * red(
                    w * (pts_tgt + t_xy[:, None, :] - tgt)) * loss_weight,
                "loss_PM_z": 3.0 * red(
                    w * (pts_tgt + t_z[:, None, :] - tgt)) * loss_weight,
            }
        return {
            "loss_PM_R": 3.0 * red(w * (pts_est - pts_tgt)) * loss_weight,
            # the *_noP terms are deliberately NOT scaled by loss_weight
            # (nor 3x): the reference's PyPMLoss leaves its _noP entries
            # unweighted too (pm_loss.py:120-171), and shipped configs
            # tune against that balance
            "loss_PM_xy_noP": red(pred_trans[:, :2] - gt_trans[:, :2]),
            "loss_PM_z_noP": red(pred_trans[:, 2] - gt_trans[:, 2]),
        }
    if disentangle_t:
        if t_use_points:
            tgt = pts_tgt + gt_trans[:, None, :]
            return {
                "loss_PM_R": 3.0 * red(
                    w * (pts_est + gt_trans[:, None, :] - tgt)) * loss_weight,
                "loss_PM_T": 3.0 * red(
                    w * (pts_tgt + pred_trans[:, None, :] - tgt)) * loss_weight,
            }
        return {
            "loss_PM_R": 3.0 * red(w * (pts_est - pts_tgt)) * loss_weight,
            "loss_PM_T_noP": red(pred_trans - gt_trans),
        }
    est = pts_est + pred_trans[:, None, :]
    tgt = pts_tgt + gt_trans[:, None, :]
    return {"loss_PM_RT": 3.0 * red(w * (est - tgt)) * loss_weight}
