"""Coordinate-bin quantization (classification xyz mode).

Counterpart of the reference's bin construction (data_loader.py:906-941) and
decoding (engine_utils.py:102-115). The shipped RDPN configs regress
coordinates directly (L1), but the CE_coor bin mode is part of the API
surface, so both directions live here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_coords(coord: jax.Array, mask: jax.Array,
                    num_bins: int) -> jax.Array:
    """[..., H, W, 3] coords in [0,1] -> int32 bins; background -> num_bins.

    Foreground bins span 0..num_bins-1; the extra last bin is background
    (reference data_loader.py:906-941).
    """
    c = jnp.clip(coord, 0.0, 0.999999)
    bins = jnp.floor(c * num_bins).astype(jnp.int32)
    bg = jnp.full_like(bins, num_bins)
    return jnp.where(mask[..., None] > 0, bins, bg)


def decode_coord_bins(logits_x: jax.Array, logits_y: jax.Array,
                      logits_z: jax.Array, num_bins: int) -> jax.Array:
    """Per-axis [..., H, W, num_bins+1] logits -> [..., H, W, 3] in [0, 1].

    Argmax decode; the background bin maps to coordinate 0
    (engine_utils.py:104-115).
    """
    def one(logits):
        b = jnp.argmax(logits, axis=-1)
        b = jnp.where(b == num_bins, 0, b)
        return b.astype(jnp.float32) / float(num_bins - 1)

    return jnp.stack([one(logits_x), one(logits_y), one(logits_z)], axis=-1)


def expected_coord_from_bins(logits: jax.Array, num_bins: int) -> jax.Array:
    """Soft (differentiable) decode: softmax expectation over the foreground
    bins. [..., num_bins+1] -> [...]. TPU-friendly alternative to argmax for
    feeding the PnP head in bin mode.

    Bin b maps to b/(num_bins-1), the REFERENCE's normalization
    (engine_utils.py:113 ``coor_ / (XYZ_BIN - 1)``) — not the exact
    inverse of ``quantize_coords``' floor, but the convention checkpoints
    were trained against; the soft and argmax decodes must agree."""
    p = jax.nn.softmax(logits[..., :num_bins], axis=-1)
    centers = jnp.arange(num_bins, dtype=p.dtype) / float(num_bins - 1)
    return jnp.sum(p * centers, axis=-1)
