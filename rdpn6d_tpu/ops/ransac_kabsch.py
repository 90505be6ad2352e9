"""Batched fixed-iteration RANSAC + weighted Kabsch pose solver.

TPU-native replacement for the reference's OpenCV PnP paths
(gdrn_evaluator.py:187-435 process_net_and_pnp / process_pnp_ransac,
lib/pysixd/misc.py:145-195 pnp_v2): with RGB-D input the predicted dense
model coordinates pair with measured camera-frame points as 3D-3D
correspondences, so the natural solver is Kabsch (orthogonal Procrustes),
which is far better posed than EPnP from 2D-3D and maps perfectly to TPU:

  * fixed iteration count, branchless hypothesis scoring (no data-dependent
    control flow);
  * every hypothesis is a 3x3 SVD — batched and vmapped;
  * correspondence sampling via Gumbel top-k over the foreground mask.

The RDPN twist: the coordinate head predicts GT-ROTATED FPS-residuals
(data_loader.py:881-887), so decoding model-frame points needs a rotation
estimate. ``refine_pose_kabsch`` uses the Patch-PnP rotation as the
decoder and refits — a net-init + geometric-refine scheme mirroring the
reference's "net_iter_pnp" mode (gdrn_evaluator.py:187-314).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.region import gather_region_fps


def kabsch(src: jax.Array, dst: jax.Array,
           weights: jax.Array | None = None,
           eps: float = 1e-9) -> tuple[jax.Array, jax.Array]:
    """Weighted least-squares rigid transform: R @ src + t ~= dst.

    src/dst [..., N, 3]; weights [..., N] (>= 0). Returns R [..., 3, 3],
    t [..., 3].
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = weights[..., None]
    wsum = jnp.sum(w, axis=-2) + eps
    c_src = jnp.sum(src * w, axis=-2) / wsum
    c_dst = jnp.sum(dst * w, axis=-2) / wsum
    a = src - c_src[..., None, :]
    b = dst - c_dst[..., None, :]
    # covariance H = a^T W b  -> [..., 3, 3]
    H = jnp.einsum("...ni,...n,...nj->...ij", a, weights, b)
    U, _, Vt = jnp.linalg.svd(H, full_matrices=False)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(V @ Ut)
    D = jnp.zeros_like(H).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0) \
        .at[..., 2, 2].set(det)
    R = V @ D @ Ut
    t = c_dst - jnp.einsum("...ij,...j->...i", R, c_src)
    return R, t


@partial(jax.jit, static_argnames=("num_hyps", "sample_size"))
def ransac_kabsch(model_pts: jax.Array, cam_pts: jax.Array,
                  mask: jax.Array, key: jax.Array,
                  num_hyps: int = 128, sample_size: int = 4,
                  inlier_thr: float = 0.01
                  ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Robust rigid fit from masked dense correspondences.

    model_pts/cam_pts [N, 3]; mask [N] (1 = valid). Returns (R, t,
    inlier_ratio). vmap over a leading ROI axis for batched solving.
    """
    n = model_pts.shape[0]
    logits = jnp.where(mask > 0, 0.0, -1e9)

    # sample hypothesis correspondence sets: Gumbel-max without replacement
    g = jax.random.gumbel(key, (num_hyps, n)) + logits
    _, idx = jax.lax.top_k(g, sample_size)               # [H, S]
    src = model_pts[idx]                                 # [H, S, 3]
    dst = cam_pts[idx]
    R_h, t_h = kabsch(src, dst)                          # [H, 3, 3], [H, 3]

    # branchless scoring against ALL masked correspondences
    pred = jnp.einsum("hij,nj->hni", R_h, model_pts) + t_h[:, None, :]
    d = jnp.linalg.norm(pred - cam_pts[None], axis=-1)   # [H, N]
    inl = (d < inlier_thr) & (mask[None] > 0)
    score = jnp.sum(inl, axis=-1)
    best = jnp.argmax(score)

    # weighted refit on the best hypothesis' inliers
    w = inl[best].astype(model_pts.dtype)
    # guard: if almost no inliers fall back to mask weights
    w = jnp.where(jnp.sum(w) >= sample_size, w, mask.astype(w.dtype))
    R, t = kabsch(model_pts, cam_pts, w)
    ratio = score[best] / jnp.maximum(jnp.sum(mask), 1.0)
    return R, t, ratio


def decode_model_coords(coord: jax.Array, region_logits: jax.Array,
                        fps: jax.Array, extent: jax.Array,
                        rot_est: jax.Array) -> jax.Array:
    """Invert the residual label construction with a rotation estimate:

        xyz_model = R_est^T @ ((coord - 0.5) * extent) + fps[argmax region]

    coord [H,W,3]; region_logits [H,W,K+1]; fps [K,3]; extent [3];
    rot_est [3,3] -> [H,W,3].
    """
    region_ids = jnp.argmax(region_logits[..., 1:], axis=-1)
    fps_sel = gather_region_fps(fps, region_ids)
    delta = jnp.einsum("ji,hwj->hwi", rot_est, (coord - 0.5) * extent)
    return delta + fps_sel


@partial(jax.jit, static_argnames=("num_hyps",))
def refine_pose_kabsch(coord: jax.Array, region_logits: jax.Array,
                       mask_prob: jax.Array, depth_xyz: jax.Array,
                       resize_ratio: jax.Array, fps: jax.Array,
                       extent: jax.Array, rot_net: jax.Array,
                       trans_net: jax.Array, key: jax.Array,
                       mask_thr: float = 0.5, num_hyps: int = 128,
                       inlier_thr: float = 0.015
                       ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Net-init + RANSAC-Kabsch refinement for ONE ROI (vmap for batches).

    coord/region_logits/mask_prob at head res [H,W,*]; depth_xyz [H,W,3]
    (the scaled crop back-projection, see pipeline._backproject_crop);
    rot_net/trans_net: the Patch-PnP estimate used to decode residuals.
    """
    cam_pts = (depth_xyz * resize_ratio).reshape(-1, 3)
    model_pts = decode_model_coords(coord, region_logits, fps, extent,
                                    rot_net).reshape(-1, 3)
    valid = (mask_prob.reshape(-1) > mask_thr) & \
            (cam_pts[:, 2] > 1e-3)
    R, t, ratio = ransac_kabsch(model_pts, cam_pts,
                                valid.astype(coord.dtype), key,
                                num_hyps=num_hyps, inlier_thr=inlier_thr)
    # fall back to the net pose when geometry is degenerate
    ok = ratio > 0.05
    R = jnp.where(ok, R, rot_net)
    t = jnp.where(ok, t, trans_net)
    return R, t, ratio
