"""SE(3) helpers: point transforms, pose composition/inversion.

Counterpart of the reference's ``lib/pysixd/misc.py:930-951``
(transform_pts_batch) and parts of ``lib/pysixd/RT_transform.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_pts(points: jax.Array, R: jax.Array,
                  t: jax.Array | None = None) -> jax.Array:
    """points [..., N, 3] @ R^T (+ t). R [..., 3, 3], t [..., 3] or None."""
    out = points @ jnp.swapaxes(R, -1, -2)
    if t is not None:
        out = out + t[..., None, :]
    return out


def compose(Ra: jax.Array, ta: jax.Array, Rb: jax.Array,
            tb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(Ra, ta) o (Rb, tb): first apply b, then a."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def invert(R: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def to_homo(R: jax.Array, t: jax.Array) -> jax.Array:
    """Pack [..., 3, 3] + [..., 3] into [..., 4, 4]."""
    batch = R.shape[:-2]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)
