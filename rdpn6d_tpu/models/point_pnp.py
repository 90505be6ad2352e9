"""PointNet-style alternative Patch-PnP heads.

Counterpart of the reference's ``PointPnPNet`` / ``SimplePointPnPNet``
(models/point_pnp_net.py:60-312, selectable via PNP_HEAD_CFG.type,
GDRN.py:790-801): treat the dense correspondence map as a point set, embed
with shared pointwise MLPs, pool globally (max) or per-region (the SoftPool
variant becomes a region-weighted soft aggregation — a matmul, which suits
the MXU far better than the reference's sort-based SoftPool).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def _denorm_bare_coords(x, extents):
    """Reference parity (point_pnp_net.py:137-138, :241-243): bare 3/5-
    channel coord assemblies are rescaled to metric space by the class
    extents; richer assemblies stay normalized (same trigger set as
    ConvPnPNet, conv_pnp_net.py:125-127)."""
    if x.shape[-1] in (3, 5) and extents is not None:
        xyz = (x[..., :3] - 0.5) * extents[:, None, None, :]
        x = jnp.concatenate([xyz, x[..., 3:]], axis=-1)
    return x


class SimplePointPnP(nn.Module):
    """Pointwise MLP + global max pool -> FC -> (rot, t)."""

    rot_dim: int = 6
    featdim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coord_feat, region=None, extents=None,
                 mask_attention=None, train: bool = False):
        x = _denorm_bare_coords(coord_feat, extents)
        if region is not None:
            x = jnp.concatenate([x, region], axis=-1)
        if mask_attention is not None:
            x = x * mask_attention
        x = x.astype(self.dtype)
        B, H, W, C = x.shape
        pts = x.reshape(B, H * W, C)
        for width in (64, 128, self.featdim):
            pts = nn.relu(nn.Dense(width, dtype=self.dtype)(pts))
        g = jnp.max(pts, axis=1)                       # [B, featdim]
        h = nn.leaky_relu(nn.Dense(256, dtype=self.dtype)(g), 0.1)
        h = nn.leaky_relu(nn.Dense(128, dtype=self.dtype)(h), 0.1)
        rot = nn.Dense(self.rot_dim, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01))(h)
        t = nn.Dense(3, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.01))(h)
        return rot.astype(jnp.float32), t.astype(jnp.float32)


class PointPnP(nn.Module):
    """Region-pooled variant: per-region soft aggregation of point features
    (replaces sort-based SoftPool with a region-softmax weighted matmul)."""

    rot_dim: int = 6
    featdim: int = 128
    num_regions: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coord_feat, region=None, extents=None,
                 mask_attention=None, train: bool = False):
        assert region is not None, "PointPnP needs region softmax"
        assert region.shape[-1] == self.num_regions, \
            (region.shape, self.num_regions)
        x = _denorm_bare_coords(coord_feat, extents)
        if mask_attention is not None:
            x = x * mask_attention
        x = x.astype(self.dtype)
        B, H, W, C = x.shape
        pts = x.reshape(B, H * W, C)
        for width in (64, 128, self.featdim):
            pts = nn.relu(nn.Dense(width, dtype=self.dtype)(pts))
        # region-weighted pooling: [B, K, HW] @ [B, HW, F] -> [B, K, F]
        w = region.reshape(B, H * W, -1)
        w = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-6)
        pooled = jnp.einsum("bpk,bpf->bkf", w.astype(self.dtype), pts)
        h = pooled.reshape(B, -1)
        h = nn.leaky_relu(nn.Dense(512, dtype=self.dtype)(h), 0.1)
        h = nn.leaky_relu(nn.Dense(256, dtype=self.dtype)(h), 0.1)
        rot = nn.Dense(self.rot_dim, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01))(h)
        t = nn.Dense(3, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.01))(h)
        return rot.astype(jnp.float32), t.astype(jnp.float32)
