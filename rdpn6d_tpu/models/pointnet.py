"""PointNet-style spatial fusion of CNN features with depth-XYZ.

Counterpart of the reference's ``md_pointnet`` (models/resnet_backbone.py:
23-54): embed the CNN feature map with a 1x1 conv, concatenate the (nearest-
downsampled) per-pixel camera-frame XYZ, run a pointwise MLP, and append a
global max-pooled feature broadcast back over the grid — yielding local+global
channels (512 + 512 = 1024 at 32x32 for the default widths).

1x1 convs over a 32x32 grid are just [HW, C] matmuls: ideal MXU work.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class SpatialPointNet(nn.Module):
    widths: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, xyz, train: bool = False):
        """feat [B, H, W, C]; xyz [B, H, W, 3] -> [B, H, W, 2*widths[-1]]."""
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            param_dtype=jnp.float32)
        emb = nn.relu(norm()(
            nn.Conv(self.widths[0], (1, 1), dtype=self.dtype)(feat)))
        h = jnp.concatenate([xyz.astype(emb.dtype), emb], axis=-1)
        h = nn.relu(norm()(nn.Conv(self.widths[1], (1, 1),
                                   dtype=self.dtype)(h)))
        h = nn.relu(norm()(nn.Conv(self.widths[2], (1, 1),
                                   dtype=self.dtype)(h)))
        local = norm()(nn.Conv(self.widths[3], (1, 1), dtype=self.dtype)(h))
        global_ft = jnp.max(local, axis=(1, 2), keepdims=True)
        global_ft = jnp.broadcast_to(global_ft, local.shape)
        return jnp.concatenate([local, global_ft], axis=-1)
