"""Batched fixed-iteration RANSAC + weighted Kabsch pose solver.

TPU-native replacement for the reference's OpenCV PnP paths
(gdrn_evaluator.py:187-435 process_net_and_pnp / process_pnp_ransac,
lib/pysixd/misc.py:145-195 pnp_v2): with RGB-D input the predicted dense
model coordinates pair with measured camera-frame points as 3D-3D
correspondences, so the natural solver is Kabsch (orthogonal Procrustes),
which is far better posed than EPnP from 2D-3D and maps perfectly to TPU:

  * fixed iteration count, branchless hypothesis scoring (no data-dependent
    control flow) in matmul form on the MXU;
  * hypothesis fits via Horn's quaternion method (matrix squaring, no
    SVD); one SVD-based weighted refit per ROI at the end;
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


def kabsch_quat(src: jax.Array, dst: jax.Array,
                weights: jax.Array | None = None,
                n_iters: int = 14,
                eps: float = 1e-9) -> tuple[jax.Array, jax.Array]:
    """Horn's quaternion closed-form rigid fit, SVD-free.

    Same contract as :func:`kabsch`, but the rotation is the dominant
    eigenvector of Horn's symmetric 4x4 K matrix, driven out by a fixed
    number of matrix squarings — branchless, trivially batched,
    and far cheaper on TPU than XLA's iterative small-matrix SVD. Always
    a proper rotation (no reflection correction needed). Used for the
    RANSAC hypothesis fits where thousands of tiny solves dominate;
    :func:`kabsch` (SVD) remains for the one final refit per ROI.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = weights[..., None]
    wsum = jnp.sum(w, axis=-2) + eps
    c_src = jnp.sum(src * w, axis=-2) / wsum
    c_dst = jnp.sum(dst * w, axis=-2) / wsum
    a = src - c_src[..., None, :]
    b = dst - c_dst[..., None, :]
    H = jnp.einsum("...ni,...n,...nj->...ij", a, weights, b)
    # Horn's K (src->dst convention): quaternion q maximizing q^T K q
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    K = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, Syy - Sxx - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, Szz - Sxx - Syy], -1),
    ], -2)                                               # [..., 4, 4]
    # shift so ALL eigenvalues are >= 0 (|lambda| <= ||K||_F), then drive
    # to the dominant eigenvector by repeated matrix squaring: after k
    # squarings M ~ lambda_max^(2^k) q q^T, so ANY non-degenerate column
    # is the quaternion — much faster convergence than power iteration
    # when the spectral gap is small (near-coplanar hypothesis samples)
    fro = jnp.sqrt(jnp.sum(K * K, axis=(-2, -1), keepdims=True)) + eps
    M = K / fro + jnp.eye(4, dtype=K.dtype)              # spectrum in [0,2]
    for _ in range(n_iters):
        M = M @ M
        M = M / (jnp.sqrt(jnp.sum(M * M, axis=(-2, -1),
                                  keepdims=True)) + eps)
    col_norm = jnp.sqrt(jnp.sum(M * M, axis=-2))         # [..., 4]
    j = jnp.argmax(col_norm, axis=-1)
    q = jnp.take_along_axis(M, j[..., None, None].repeat(4, -2),
                            axis=-1)[..., 0]             # [..., 4]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
                   2 * (qx * qz + qw * qy)], -1),
        jnp.stack([2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
                   2 * (qy * qz - qw * qx)], -1),
        jnp.stack([2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
                   1 - 2 * (qx * qx + qy * qy)], -1),
    ], -2)
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

    # sample hypothesis correspondence sets by inverse-CDF over the mask:
    # H*S uniforms + a searchsorted instead of H*N gumbels + top_k (the
    # gumbel formulation generated ~0.5M randoms and sorted 4096 values
    # per hypothesis — dominant cost of the whole refinement). Within-
    # hypothesis duplicate picks are possible but merely weaken that one
    # hypothesis (its fit degenerates and it loses the vote).
    cdf = jnp.cumsum(mask.astype(jnp.float32))
    total = jnp.maximum(cdf[-1], 1.0)
    u = jax.random.uniform(key, (num_hyps, sample_size),
                           minval=0.0, maxval=1.0) * total
    idx = jnp.clip(jnp.searchsorted(cdf, u), 0, n - 1)   # [H, S]
    src = model_pts[idx]                                 # [H, S, 3]
    dst = cam_pts[idx]
    R_h, t_h = kabsch_quat(src, dst)                     # [H, 3, 3], [H, 3]

    # branchless scoring against ALL masked correspondences, in matmul
    # form: d^2_hn = |R_h m_n + t_h - c_n|^2 expands to terms that are all
    # [H,9]@[9,N] / [H,3]@[3,N] MXU matmuls — the naive einsum
    # materializes a [H,N,3] intermediate (HBM-bound at vmapped batch
    # sizes)
    m2 = jnp.sum(model_pts * model_pts, axis=-1)         # [N]
    c2 = jnp.sum(cam_pts * cam_pts, axis=-1)             # [N]
    outer = (cam_pts[:, :, None]
             * model_pts[:, None, :]).reshape(n, 9)      # [N, 9] c m^T
    vecR = R_h.reshape(num_hyps, 9)                      # [H, 9]
    cross = vecR @ outer.T                               # [H, N] m^T R^T c
    Rt_t = jnp.einsum("hji,hj->hi", R_h, t_h)            # [H, 3] R^T t
    t2 = jnp.sum(t_h * t_h, axis=-1)                     # [H]
    d2 = (m2[None] + c2[None] + t2[:, None]
          + 2.0 * (Rt_t @ model_pts.T)                   # 2 t.(R m)
          - 2.0 * cross                                  # -2 c.(R m)
          - 2.0 * (t_h @ cam_pts.T))                     # -2 t.c
    inl = (d2 < inlier_thr * inlier_thr) & (mask[None] > 0)
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
