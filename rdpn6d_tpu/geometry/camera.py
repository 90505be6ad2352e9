"""Pinhole camera math: projection, back-projection, crop-adjusted intrinsics,
and centroid/z pose recovery.

Counterpart of the reference's ``lib/pysixd/misc.py`` (backproject :319,
calc_xyz_bp_fast :288) and ``core/gdrn_modeling/models/pose_from_pred_centroid_z.py``.
Everything is batched JAX; pose recovery stays on-device and differentiable in
train and test alike.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .allocentric import allo_to_ego_mat


def project(points: jax.Array, K: jax.Array, R: jax.Array,
            t: jax.Array) -> jax.Array:
    """Project model points to pixels. points [..., N, 3], K/R [..., 3, 3],
    t [..., 3] -> [..., N, 2]."""
    pc = points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    uvw = pc @ jnp.swapaxes(K, -1, -2)
    return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-9)


def backproject_depth(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Per-pixel camera-frame XYZ from a depth map.

    depth: [..., H, W]; K: [..., 3, 3] -> xyz [..., H, W, 3].
    Pixel (u=x col, v=y row) centers at integer coordinates (cv2 convention).
    """
    H, W = depth.shape[-2], depth.shape[-1]
    u = jnp.arange(W, dtype=depth.dtype)
    v = jnp.arange(H, dtype=depth.dtype)
    uu, vv = jnp.meshgrid(u, v)  # [H, W]
    fx = K[..., 0, 0][..., None, None]
    fy = K[..., 1, 1][..., None, None]
    cx = K[..., 0, 2][..., None, None]
    cy = K[..., 1, 2][..., None, None]
    x = (uu - cx) * depth / fx
    y = (vv - cy) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)


def crop_K(K: jax.Array, affine: jax.Array) -> jax.Array:
    """Compose a 2x3 image affine with intrinsics: K' = [[A];[0 0 1]] @ K.

    Mirrors the reference's ``newCameraK = offset_matrix @ K``
    (data_loader.py:744-748): after warping the image with ``affine``, the
    warped frame behaves like a pinhole camera with intrinsics K'.
    """
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=K.dtype), affine.shape[:-2] + (1, 3)
    )
    A3 = jnp.concatenate([affine, bottom], axis=-2)
    return A3 @ K


def recover_pose_centroid_z(
    rot_allo: jax.Array,
    centroid_rel: jax.Array,
    z_rel: jax.Array,
    K: jax.Array,
    bbox_center: jax.Array,
    bbox_wh: jax.Array,
    resize_ratio: jax.Array,
    z_type: str = "REL",
    is_allo: bool = True,
    eps: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """Egocentric (R, t) from network outputs.

    The network regresses, per ROI:
      * rot_allo       [..., 3, 3]  allocentric rotation
      * centroid_rel   [..., 2]     (cx - box_cx)/bw, (cy - box_cy)/bh
      * z_rel          [...]        tz / resize_ratio  (z_type="REL")

    Inverse of the label construction at reference data_loader.py:1005-1010
    (trans_ratio) and the recovery algebra at pose_from_pred_centroid_z.py:91-105:
        tx = (cx - px) * tz / fx,  ty = (cy - py) * tz / fy,  tz = z.
    """
    c_abs = centroid_rel * bbox_wh + bbox_center  # [..., 2]
    if z_type == "REL":
        z = z_rel * resize_ratio
    elif z_type == "ABS":
        z = z_rel
    elif z_type == "LOG":
        z = jnp.exp(z_rel)
    elif z_type == "NEG_LOG":
        z = jnp.exp(-z_rel)
    else:
        raise ValueError(f"unknown z_type: {z_type}")
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    px, py = K[..., 0, 2], K[..., 1, 2]
    tx = z * (c_abs[..., 0] - px) / fx
    ty = z * (c_abs[..., 1] - py) / fy
    trans = jnp.stack([tx, ty, z], axis=-1)
    rot_ego = allo_to_ego_mat(trans, rot_allo, eps=eps) if is_allo else rot_allo
    return rot_ego, trans
