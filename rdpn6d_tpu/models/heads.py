"""Decoder heads: dense mask / coordinate / region head and the optional
translation head.

Counterpart of the reference's ``RotWithRegionHead``
(models/cdpn_rot_head_region.py:9-198) and ``TransHeadNet``
(models/cdpn_trans_head.py:8-70). Channel counts are DERIVED from the config
(the reference hardcodes in_channels=1024 at cdpn_rot_head_region.py:31 —
SURVEY.md lists that as a quirk not to replicate).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .quant import conv_factory


def _make_norm(kind: str, gn_groups: int, train: bool, dtype):
    if kind == "BN":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            dtype=dtype, param_dtype=jnp.float32)
    if kind == "GN":
        return nn.GroupNorm(num_groups=gn_groups, dtype=dtype,
                            param_dtype=jnp.float32)
    raise ValueError(f"unknown norm: {kind}")


class DenseHead(nn.Module):
    """ConvTranspose x2 upsample (32->64) + num_layers x [conv3x3-norm-relu x2]
    + 1x1 output conv emitting mask/coord/region channels."""

    mask_dim: int = 1
    coord_dim: int = 3
    region_dim: int = 33
    num_filters: int = 256
    num_layers: int = 3
    norm: str = "BN"
    gn_groups: int = 32
    dtype: Any = jnp.float32
    int8: bool = False              # quantize the body convs (models/quant.py)
    int8_static: Any = False        # False | True | "per_channel"
    init_mode: str = "reference"         # reference tiny-init | fan_in (config.py)

    @nn.compact
    def __call__(self, x, train: bool = False, skip64=None):
        """x [B, 32, 32, C] -> (mask [B,64,64,Dm], coord [B,64,64,Dc],
        region [B,64,64,Dr]). ``skip64``: optional full-res trunk skip
        concatenated after upsampling (the reference's ROT_CONCAT multi-
        scale fusion, cdpn_rot_head_region.py:148-168, re-designed for the
        32->64 decoder)."""
        # padding/((1,2),(1,2)) + transpose_kernel matches torch
        # ConvTranspose2d(k3, s2, p1, output_padding=1) exactly (verified to
        # 1e-7), so reference checkpoints convert losslessly.
        # (A 4-phase matmul decomposition — TorchConvTranspose2x — was
        # benchmarked at -10% throughput: XLA already lowers this convT
        # without materializing the zero-dilated input.)
        # from-scratch init: "reference" = the CDPN tiny normal(0.001)
        # everywhere (cdpn_rot_head_region.py:140-146); "fan_in" =
        # lecun_normal for short-horizon rigs (see config.HeadConfig.init)
        init001 = nn.initializers.normal(0.001) if self.init_mode == "reference" \
            else nn.initializers.lecun_normal()
        x = nn.ConvTranspose(self.num_filters, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)), use_bias=False,
                             transpose_kernel=True, kernel_init=init001,
                             dtype=self.dtype)(x)
        x = _make_norm(self.norm, self.gn_groups, train, self.dtype)(x)
        x = nn.relu(x)
        if skip64 is not None:
            x = jnp.concatenate([x, skip64.astype(x.dtype)], axis=-1)
        conv = conv_factory(self.int8, self.dtype, self.int8_static)
        for i in range(self.num_layers):
            if i >= 3:  # extra layers upsample further (reference :104)
                from ..ops.resize import upsample_bilinear_align_corners
                x = upsample_bilinear_align_corners(
                    x, x.shape[1] * 2, x.shape[2] * 2)
            for _ in range(2):
                x = conv(self.num_filters, (3, 3), padding=1,
                         use_bias=False, kernel_init=init001)(x)
                x = _make_norm(self.norm, self.gn_groups, train,
                               self.dtype)(x)
                x = nn.relu(x)
        # output logits conv stays bf16/f32 regardless of int8 mode; name
        # continues the body sequence so the param tree matches exactly
        out = nn.Conv(self.mask_dim + self.coord_dim + self.region_dim,
                      (1, 1), dtype=self.dtype, kernel_init=init001,
                      name=f"Conv_{2 * self.num_layers}")(x)
        out = out.astype(jnp.float32)  # logits in f32 for stable losses
        mask = out[..., : self.mask_dim]
        coord = out[..., self.mask_dim: self.mask_dim + self.coord_dim]
        region = out[..., self.mask_dim + self.coord_dim:]
        return mask, coord, region


class TransHead(nn.Module):
    """Optional direct-translation head (reference TransHeadNet; disabled in
    all shipped configs, kept for API parity)."""

    num_filters: int = 256
    num_layers: int = 3
    norm: str = "BN"
    gn_groups: int = 32
    dtype: Any = jnp.float32
    init_mode: str = "reference"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference TransHeadNet tiny-init parity (cdpn_trans_head.py:45-53)
        init001 = nn.initializers.normal(0.001) if self.init_mode == "reference" \
            else nn.initializers.lecun_normal()
        for _ in range(self.num_layers):
            x = nn.Conv(self.num_filters, (3, 3), padding=1, use_bias=False,
                        kernel_init=init001, dtype=self.dtype)(x)
            x = _make_norm(self.norm, self.gn_groups, train, self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, kernel_init=init001,
                             dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(4096, kernel_init=init001,
                             dtype=self.dtype)(x))
        return nn.Dense(3, kernel_init=init001,
                        dtype=self.dtype)(x).astype(jnp.float32)
