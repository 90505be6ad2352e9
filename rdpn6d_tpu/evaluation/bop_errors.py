"""BOP19 challenge errors: MSSD, MSPD (batched JAX) and VSD (rasterizer).

Counterpart of the reference's ``lib/pysixd/pose_error.py`` mssd/mspd/vsd
(used via the BOP-toolkit subprocess path, test_utils.py:53-75 ->
eval_calc_errors.py). MSSD/MSPD take the identity-padded symmetry banks and
reduce min-over-symmetries, max-over-points on device; VSD renders est/gt
depth with the native software rasterizer (ops/rasterizer.py) instead of an
EGL/C++ GL renderer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import project, transform_pts


def _gt_sym_poses(R_gt, t_gt, sym_rots, sym_trans):
    """Symmetry-equivalent GT poses: R = R_gt S_R, t = R_gt S_t + t_gt —
    BOP symmetries are full 4x4 transforms (misc.py:206-254); dropping
    S_t mis-places objects whose symmetry center is off-origin."""
    R_gt_s = R_gt[..., None, :, :] @ sym_rots            # [..., S, 3, 3]
    if sym_trans is None:
        t_gt_s = jnp.broadcast_to(t_gt[..., None, :],
                                  R_gt_s.shape[:-2] + (3,))
    else:
        t_gt_s = jnp.einsum("...ij,...sj->...si",
                            R_gt, sym_trans) + t_gt[..., None, :]
    return R_gt_s, t_gt_s


def mssd(R_est: jax.Array, t_est: jax.Array, R_gt: jax.Array,
         t_gt: jax.Array, pts: jax.Array, sym_rots: jax.Array,
         sym_trans: jax.Array | None = None) -> jax.Array:
    """Maximum symmetry-aware surface distance.

    [...,3,3], [...,3], pts [...,N,3], sym_rots [...,S,3,3] (id-padded),
    sym_trans [...,S,3] (zero-padded; m). min over symmetries of max over
    points of the point distance.
    """
    pe = transform_pts(pts, R_est, t_est)                # [..., N, 3]
    R_gt_s, t_gt_s = _gt_sym_poses(R_gt, t_gt, sym_rots, sym_trans)
    pg = transform_pts(pts[..., None, :, :], R_gt_s, t_gt_s)
    d = jnp.linalg.norm(pe[..., None, :, :] - pg, axis=-1)  # [..., S, N]
    return jnp.min(jnp.max(d, axis=-1), axis=-1)


def mspd(R_est: jax.Array, t_est: jax.Array, R_gt: jax.Array,
         t_gt: jax.Array, pts: jax.Array, sym_rots: jax.Array,
         K: jax.Array, sym_trans: jax.Array | None = None) -> jax.Array:
    """Maximum symmetry-aware projection distance (pixels)."""
    pe = project(pts, K, R_est, t_est)                   # [..., N, 2]
    R_gt_s, t_gt_s = _gt_sym_poses(R_gt, t_gt, sym_rots, sym_trans)
    pg = project(pts[..., None, :, :], K[..., None, :, :], R_gt_s, t_gt_s)
    d = jnp.linalg.norm(pe[..., None, :, :] - pg, axis=-1)
    return jnp.min(jnp.max(d, axis=-1), axis=-1)


def _np_gt_sym_poses(R_gt, t_gt, sym_rots, sym_trans):
    R_gt_s = R_gt[None] @ sym_rots                       # [S, 3, 3]
    t_gt_s = (sym_trans @ R_gt.T if sym_trans is not None
              else np.zeros((len(sym_rots), 3), R_gt.dtype)) + t_gt
    return R_gt_s, t_gt_s


def mssd_np(R_est, t_est, R_gt, t_gt, pts, sym_rots,
            sym_trans=None) -> float:
    """Host numpy mssd for ONE (estimate, GT) pair: the BOP19 scorer
    walks pairs in python, and a per-pair device dispatch + sync costs
    ~ms of relay latency each against ~us of host math (N~3k points)."""
    pe = pts @ R_est.T + t_est                           # [N, 3]
    R_gt_s, t_gt_s = _np_gt_sym_poses(R_gt, t_gt, sym_rots, sym_trans)
    pg = np.einsum("nj,sij->sni", pts, R_gt_s) + t_gt_s[:, None, :]
    d = np.linalg.norm(pe[None] - pg, axis=-1)           # [S, N]
    return float(d.max(axis=1).min())


def mspd_np(R_est, t_est, R_gt, t_gt, pts, sym_rots, K,
            sym_trans=None) -> float:
    """Host numpy mspd for one pair (see mssd_np)."""
    def proj(p):                                          # [..., N, 3]
        c = p @ K.T
        return c[..., :2] / c[..., 2:3]

    pe = proj(pts @ R_est.T + t_est)
    R_gt_s, t_gt_s = _np_gt_sym_poses(R_gt, t_gt, sym_rots, sym_trans)
    pg = proj(np.einsum("nj,sij->sni", pts, R_gt_s) + t_gt_s[:, None, :])
    d = np.linalg.norm(pe[None] - pg, axis=-1)
    return float(d.max(axis=1).min())


def vsd(R_est: np.ndarray, t_est: np.ndarray, R_gt: np.ndarray,
        t_gt: np.ndarray, depth_test: np.ndarray, K: np.ndarray,
        verts: np.ndarray, faces: np.ndarray,
        delta: float = 15.0 / 1000.0, taus=(0.05,),
        diameter: float | None = None,
        normalized_by_diameter: bool = True,
        cost_type: str = "step") -> list[float]:
    """Visible surface discrepancy (pose_error.py vsd; BOP19 defaults).

    depth_test: [H, W] scene depth (m). Returns one error per tau; taus are
    fractions of the diameter when normalized_by_diameter else meters.
    """
    from ..ops.rasterizer import render_mesh

    H, W = depth_test.shape
    d_est, _ = render_mesh(verts, faces, K, R_est, t_est, H, W)
    d_gt, _ = render_mesh(verts, faces, K, R_gt, t_gt, H, W)
    return vsd_from_depths(d_est, d_gt, depth_test, delta=delta, taus=taus,
                           diameter=diameter,
                           normalized_by_diameter=normalized_by_diameter,
                           cost_type=cost_type)


def vsd_from_depths(d_est: np.ndarray, d_gt: np.ndarray,
                    depth_test: np.ndarray,
                    delta: float = 15.0 / 1000.0, taus=(0.05,),
                    diameter: float | None = None,
                    normalized_by_diameter: bool = True,
                    cost_type: str = "step") -> list[float]:
    """VSD from PRE-RENDERED est/gt depth maps.

    Split out so scorers can cache renders: the GT depth depends only on
    (object, gt pose, camera) and is identical for every estimate of the
    same target — the reference re-renders it per estimate pair
    (eval_calc_errors.py), which dominates full-test-set VSD time.
    """
    # visibility masks, toolkit 'bop19' mode (visibility.py:34-37):
    # visible where the rendered surface is within delta of (or in front
    # of) the measured scene depth OR the scene depth is missing (shiny
    # objects the sensor can't capture); est visibility additionally
    # includes pixels visible in gt (estimate_visib_mask_est:58-76)
    valid_scene = depth_test > 0

    def visib(d):
        m = d > 0
        # toolkit uses <= delta (a boundary pixel exactly at delta counts)
        below = m & valid_scene & (d - depth_test <= delta)
        only_render = m & ~valid_scene
        return below | only_render

    v_gt = visib(d_gt)
    v_est = visib(d_est) | ((d_est > 0) & v_gt)

    inter = v_gt & v_est
    union = v_gt | v_est
    n_union = int(union.sum())
    if n_union == 0:
        return [1.0] * len(taus)
    # tau-invariant pieces hoisted out of the loop (BOP19 sweeps 10 taus)
    diff = np.abs(d_est[inter] - d_gt[inter])
    n_outer = float((~inter & union).sum())
    errs = []
    for tau in taus:
        tau_abs = tau * diameter if (normalized_by_diameter
                                     and diameter is not None) else tau
        if cost_type == "step":
            cost_sum = float((diff > tau_abs).sum())
        else:  # tlinear
            cost_sum = float(np.clip(diff / tau_abs, 0, 1).sum())
        errs.append((cost_sum + n_outer) / n_union)
    return errs
