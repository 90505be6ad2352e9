"""Region labels and FPS-residual coordinates — the RDPN twist.

Counterpart of the reference's ``xyz_to_region`` (core/utils/data_utils.py:
229-253) plus the residual construction in the loader
(data_loader.py:881-887): each foreground pixel is assigned to its nearest
FPS keypoint (1..K, 0 = background), and the dense coordinate target becomes
the CAMERA-ROTATED residual ``R_gt @ (xyz - fps[region])`` normalized by the
model extent to [0, 1].

The reference computes this per-sample on the host with scipy ``cdist``;
here it is a single batched matmul-style distance argmin that runs inside
the jitted preprocessing graph (K <= 33, H = W = 64: trivially MXU-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xyz_to_region(xyz: jax.Array, fps_points: jax.Array
                  ) -> tuple[jax.Array, jax.Array]:
    """Nearest-FPS region id and raw residual.

    xyz: [..., H, W, 3] object-frame coordinate map (0 at background).
    fps_points: [..., K, 3].
    Returns (region [..., H, W] int32 in 0..K with 0 = bg,
             delta [..., H, W, 3] = xyz - fps[nearest]).
    """
    mask = (xyz[..., 0] != 0) | (xyz[..., 1] != 0) | (xyz[..., 2] != 0)
    # squared distances [..., H, W, K] via |a|^2 - 2 a.b + |b|^2.
    # precision="highest": this produces TRAINING LABELS — at the default
    # TPU matmul precision the cross term rounds inputs to bf16, and
    # pixels whose two nearest keypoints differ by less than the rounding
    # error get a different region id than the reference's exact cdist
    d = (
        jnp.sum(xyz * xyz, axis=-1, keepdims=True)
        - 2.0 * jnp.einsum("...hwc,...kc->...hwk", xyz, fps_points,
                           precision="highest")
        + jnp.sum(fps_points * fps_points, axis=-1)[..., None, None, :]
    )
    nearest = jnp.argmin(d, axis=-1)  # [..., H, W]
    region = jnp.where(mask, nearest.astype(jnp.int32) + 1, 0)
    delta = xyz - _gather_fps(fps_points, nearest)
    return region, delta


def _gather_fps(fps_points: jax.Array, nearest: jax.Array) -> jax.Array:
    """fps_points [..., K, 3] indexed by nearest [..., H, W] -> [..., H, W, 3]."""
    flat = nearest.reshape(nearest.shape[:-2] + (-1,))  # [..., H*W]
    sel = jnp.take_along_axis(fps_points, flat[..., None], axis=-2)
    return sel.reshape(nearest.shape + (3,))


def residual_coord_target(
    xyz: jax.Array,
    fps_points: jax.Array,
    rot_gt: jax.Array,
    extent: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Full RDPN coordinate target: region ids + normalized rotated residual.

    xyz: [..., H, W, 3]; fps_points [..., K, 3]; rot_gt [..., 3, 3];
    extent [..., 3].
    Returns (region [..., H, W], coord_target [..., H, W, 3] in ~[0, 1]):
        coord = (R_gt @ (xyz - fps[region])) / extent + 0.5
    (reference data_loader.py:881-903).
    """
    region, delta = xyz_to_region(xyz, fps_points)
    # label-producing rotation: keep it exact (see xyz_to_region)
    rotated = jnp.einsum("...ij,...hwj->...hwi", rot_gt, delta,
                         precision="highest")
    coord = rotated / extent[..., None, None, :] + 0.5
    return region, coord


def gather_region_fps(fps_points: jax.Array, region_ids: jax.Array
                      ) -> jax.Array:
    """Model-side gather: per-pixel FPS keypoint for PREDICTED region ids.

    fps_points [..., K, 3]; region_ids [..., H, W] in 0..K-1 (bg channel
    already dropped) -> [..., H, W, 3]. Mirrors GDRN.py:206-218's
    argmax-region gather feeding the Patch-PnP head.
    """
    return _gather_fps(fps_points, region_ids)
