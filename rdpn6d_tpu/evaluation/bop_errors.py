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
    # visibility masks: rendered surface within delta of (or in front of)
    # the measured scene depth; est visibility additionally includes pixels
    # visible in gt (BOP visibility.estimate_visib_mask_est semantics)
    valid_scene = depth_test > 0

    def visib(d):
        m = d > 0
        below = m & valid_scene & (d - depth_test < delta)
        only_render = m & ~valid_scene
        return below | only_render

    v_gt = visib(d_gt)
    v_est = visib(d_est) | ((d_est > 0) & v_gt)

    inter = v_gt & v_est
    union = v_gt | v_est
    n_union = int(union.sum())
    errs = []
    for tau in taus:
        tau_abs = tau * diameter if (normalized_by_diameter
                                     and diameter is not None) else tau
        if n_union == 0:
            errs.append(1.0)
            continue
        diff = np.abs(d_est - d_gt)
        if cost_type == "step":
            cost = (diff > tau_abs).astype(np.float64)
        else:  # tlinear
            cost = np.clip(diff / tau_abs, 0, 1)
        e = (cost[inter].sum() + float((~inter & union).sum())) / n_union
        errs.append(float(e))
    return errs
