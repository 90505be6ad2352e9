"""Torch-convention resizes as matmuls.

The reference upsamples with ``nn.UpsamplingBilinear2d`` — bilinear with
align_corners=True (resnet_backbone.py:281, cdpn_rot_head_region.py:69,104)
— and downsamples xyz with ``F.interpolate(mode='nearest')``
(resnet_backbone.py:307), which picks source index floor(i*in/out). Neither
matches jax.image.resize's half-pixel sampling, so checkpoint-converted
models would silently drift. Both are expressed here as static gathers /
separable matmuls (MXU-friendly: the bilinear up is two small einsums).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _align_corners_weights(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] interpolation matrix, torch align_corners=True."""
    w = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        w[:, 0] = 1.0
        return w
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float32)
    w[np.arange(n_out), lo] += 1.0 - frac
    w[np.arange(n_out), hi] += frac
    return w


def upsample_bilinear_align_corners(x: jax.Array, h_out: int,
                                    w_out: int | None = None) -> jax.Array:
    """NHWC bilinear resize with torch align_corners=True semantics."""
    w_out = w_out or h_out
    _, h_in, w_in, _ = x.shape
    wh = jnp.asarray(_align_corners_weights(h_in, h_out), x.dtype)
    ww = jnp.asarray(_align_corners_weights(w_in, w_out), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("ow,bhwc->bhoc", ww, x)


def downsample_nearest_torch(x: jax.Array, h_out: int,
                             w_out: int | None = None) -> jax.Array:
    """NHWC nearest resize matching F.interpolate(mode='nearest'):
    src index = floor(dst * in/out) (a pure strided slice when in % out == 0).
    """
    w_out = w_out or h_out
    _, h_in, w_in, _ = x.shape
    if h_in % h_out == 0 and w_in % w_out == 0:
        return x[:, :: h_in // h_out, :: w_in // w_out, :]
    hi = (np.arange(h_out) * h_in // h_out).astype(np.int32)
    wi = (np.arange(w_out) * w_in // w_out).astype(np.int32)
    return x[:, jnp.asarray(hi), :, :][:, :, jnp.asarray(wi), :]
