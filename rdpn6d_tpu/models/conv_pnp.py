"""Patch-PnP: a small CNN that regresses rotation + centroid/z directly from
the dense correspondence features.

Counterpart of the reference's ``ConvPnPNet`` (models/conv_pnp_net.py:41-163).
Input channels are derived from the feature assembly (the reference hardcodes
nIn=43 at conv_pnp_net.py:73); the coordinate channels are denormalized by the
per-class extents before the convs exactly when they are raw 3-channel coords
(conv_pnp_net.py:125-127).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def dropblock(x: jax.Array, key: jax.Array, drop_prob,
              block_size: int = 5) -> jax.Array:
    """DropBlock regularization: zero contiguous block_size^2 spatial
    patches (reference vendored DropBlock2D,
    core/utils/dropblock/dropblock.py:33-77; applied once on the PnP
    input map, conv_pnp_net.py:144-146). Matches the vendored variant,
    NOT the paper: gamma = drop_prob / block_size^2 with no
    edge-correction factor (:76-77), and the rescale is BATCH-GLOBAL
    (numel / mask.sum(), :57) rather than per-sample."""
    B, H, W, _ = x.shape
    gamma = drop_prob / block_size ** 2
    seeds = jax.random.bernoulli(key, gamma, (B, H, W, 1)).astype(x.dtype)
    block = nn.max_pool(seeds, (block_size, block_size), strides=(1, 1),
                        padding="SAME")
    mask = 1.0 - block
    keep = jnp.mean(mask)  # batch-global keep rate (dropblock.py:57)
    return x * mask / jnp.maximum(keep, 1e-6)


class ConvPnPNet(nn.Module):
    rot_dim: int = 6
    featdim: int = 128
    num_layers: int = 3
    gn_groups: int = 32
    norm: str = "GN"
    fc1_dim: int = 1024
    fc2_dim: int = 256
    denorm_coords_by_extent: bool = True
    drop_prob: float = 0.0          # DropBlock on the input feature map
    drop_block_size: int = 5
    dtype: Any = jnp.float32
    init_mode: str = "reference"         # reference tiny-init | fan_in (config.py)

    @nn.compact
    def __call__(self, coord_feat, region=None, extents=None,
                 mask_attention=None, mask_concat=None,
                 train: bool = False, drop_scale=1.0):
        """coord_feat [B, 64, 64, C]; region [B, 64, 64, K] softmax;
        extents [B, 3]; mask_attention [B, 64, 64, 1] ("mul" mode);
        mask_concat [B, 64, 64, 1] ("concat" mode — appended AFTER
        region, matching the reference's [coor_feat, region, mask]
        channel order, conv_pnp_net.py:128-138).

        Returns (rot_param [B, rot_dim], trans_param [B, 3]).
        """
        x = coord_feat
        # The reference denormalizes only for bare coord assemblies
        # (in_c in {3,5,6,8}, conv_pnp_net.py:125-127, judged on
        # coor_feat BEFORE region/mask concat); richer assemblies
        # (e.g. 11 = coords+coord2d+region_fps) stay in normalized space.
        if self.denorm_coords_by_extent and x.shape[-1] in (3, 5, 6, 8):
            assert extents is not None
            xyz = (x[..., :3] - 0.5) * extents[:, None, None, :]
            x = jnp.concatenate([xyz, x[..., 3:]], axis=-1)
        if region is not None:
            x = jnp.concatenate([x, region], axis=-1)
        if mask_attention is not None:
            x = x * mask_attention  # "mul" attention (conv_pnp_net.py:134-137)
        if mask_concat is not None:
            x = jnp.concatenate([x, mask_concat], axis=-1)

        if train and self.drop_prob > 0:
            # linear 0->drop_prob ramp comes in as drop_scale (the
            # reference's LinearScheduler over 5000 steps,
            # conv_pnp_net.py:67-72)
            x = dropblock(x, self.make_rng("dropout"),
                          self.drop_prob * drop_scale,
                          self.drop_block_size)

        x = x.astype(self.dtype)
        # "reference": all ConvPnPNet convs and fc1/fc2 use the deliberate
        # tiny normal(std=0.001) init, only fc_r/fc_t use 0.01
        # (conv_pnp_net.py:104-114); "fan_in": lecun_normal for
        # short-horizon rigs (config.HeadConfig.init)
        init001 = nn.initializers.normal(0.001) if self.init_mode == "reference" \
            else nn.initializers.lecun_normal()
        for i in range(self.num_layers):
            stride = 2 if i < 3 else 1  # 64 -> 8 over the first three convs
            x = nn.Conv(self.featdim, (3, 3), strides=(stride, stride),
                        padding=1, use_bias=False, kernel_init=init001,
                        dtype=self.dtype)(x)
            if self.norm == "GN":
                x = nn.GroupNorm(num_groups=self.gn_groups, dtype=self.dtype,
                                 param_dtype=jnp.float32)(x)
            else:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.relu(x)

        x = x.reshape(x.shape[0], -1)  # [B, 8*8*featdim]
        x = nn.leaky_relu(nn.Dense(self.fc1_dim, kernel_init=init001,
                                   dtype=self.dtype)(x), 0.1)
        x = nn.leaky_relu(nn.Dense(self.fc2_dim, kernel_init=init001,
                                   dtype=self.dtype)(x), 0.1)
        rot = nn.Dense(self.rot_dim, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01))(x)
        t = nn.Dense(3, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.01))(x)
        return rot.astype(jnp.float32), t.astype(jnp.float32)
