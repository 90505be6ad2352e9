"""Allocentric <-> egocentric rotation conversion, fully on-device.

Counterpart of the reference's ``core/utils/utils.py:39-242``
(allocentric_to_egocentric / egocentric_to_allocentric / allo_to_ego_mat_torch),
re-derived as branchless batched JAX so it stays differentiable and jit-safe at
both train AND test time (the reference drops to per-sample numpy at test,
``pose_from_pred_centroid_z.py:110-141`` — a host round-trip we avoid).

The correction rotates by the angle between the camera optical axis (0,0,1)
and the ray to the object centroid, about their cross product.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotations import normalize


def _rotation_cam_to_obj(translation: jax.Array,
                         eps: float = 1e-6) -> jax.Array:
    """Rotation taking the optical axis (0,0,1) onto the centroid ray.

    Uses the exact branchless form R = I + [u]x + [u]x^2 / (1 + c) with
    u = cam_ray x obj_ray and c = cos(angle) = obj_ray_z — no arccos, so it
    is numerically exact at the pole (object on the optical axis) and only
    singular at c = -1 (object behind the camera, physically impossible
    for a visible detection).
    """
    v = normalize(translation, eps=eps)
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(vx)
    # u = (0,0,1) x v = (-vy, vx, 0); K = skew(u)
    K = jnp.stack(
        [zero, zero, vx,
         zero, zero, vy,
         -vx, -vy, zero],
        axis=-1,
    ).reshape(vx.shape + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    return eye + K + (K @ K) / (1.0 + vz + eps)[..., None, None]


def allo_to_ego_mat(translation: jax.Array, rot_allo: jax.Array,
                    eps: float = 1e-6) -> jax.Array:
    """R_ego = R_corr(t) @ R_allo. translation [..., 3], rot [..., 3, 3]."""
    return _rotation_cam_to_obj(translation, eps) @ rot_allo


def ego_to_allo_mat(translation: jax.Array, rot_ego: jax.Array,
                    eps: float = 1e-6) -> jax.Array:
    """R_allo = R_corr(t)^T @ R_ego (inverse correction)."""
    corr = _rotation_cam_to_obj(translation, eps)
    return jnp.swapaxes(corr, -1, -2) @ rot_ego
