"""ResNet trunk, flax.linen, NHWC (TPU-native conv layout).

Counterpart of the reference's ``models/resnet_backbone.py`` (spec table
:15-21, trunk :264-340). The trunk consumes the RGB half of the 6-channel
ROI; the depth-XYZ half feeds the PointNet fusion branch (see
``pointnet.py``). Compute dtype is a policy parameter: bf16 activations with
f32 params/batch-stats is the TPU sweet spot; norm statistics always reduce
in f32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .quant import conv_factory

RESNET_SPECS: dict[int, tuple[str, Sequence[int]]] = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    int8: bool = False              # W8A8 serving mode (models/quant.py)
    int8_static: Any = False        # False | True | "per_channel"

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = conv_factory(self.int8, self.dtype, self.int8_static)
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            param_dtype=jnp.float32)
        residual = x
        y = conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                 padding=1, use_bias=False)(x)
        y = nn.relu(norm()(y))
        y = conv(self.planes, (3, 3), padding=1, use_bias=False)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = conv(self.planes, (1, 1),
                            strides=(self.stride, self.stride),
                            use_bias=False)(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    int8: bool = False
    int8_static: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = conv_factory(self.int8, self.dtype, self.int8_static)
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            param_dtype=jnp.float32)
        out_planes = self.planes * 4
        residual = x
        y = conv(self.planes, (1, 1), use_bias=False)(x)
        y = nn.relu(norm()(y))
        y = conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                 padding=1, use_bias=False)(y)
        y = nn.relu(norm()(y))
        y = conv(out_planes, (1, 1), use_bias=False)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = conv(out_planes, (1, 1),
                            strides=(self.stride, self.stride),
                            use_bias=False)(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNetTrunk(nn.Module):
    """conv7x7/2 + maxpool/2 + 4 stages. 256^2 input -> 8x8 final feature."""

    depth: int = 34
    dtype: Any = jnp.float32
    int8: bool = False              # W8A8 serving mode (models/quant.py)
    int8_static: Any = False        # False | True | "per_channel"
    int8_stages: Any = None         # None = all stages when int8; else a
    # 4-tuple of bools selecting which stages quantize (per-stage int8
    # sensitivity attribution, PERF.md round 4)

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_skips: bool = False):
        block_kind, layers = RESNET_SPECS[self.depth]
        block: Callable = BasicBlock if block_kind == "basic" else Bottleneck
        conv = conv_factory(self.int8, self.dtype, self.int8_static)

        # the stem stays full precision under int8 (keep-first-layer-fp,
        # standard W8A8 practice): quantizing the raw normalized-RGB input
        # costs disproportionate signal for a 7x7x3->64 conv that is a
        # negligible FLOPs fraction. (NOTE the trunk consumes ONLY the RGB
        # half of roi_img — depth-XYZ joins later at SpatialPointNet,
        # whose metric-coordinate inputs are the real mixed-dynamic-range
        # hazard if its 1x1 convs are ever quantized.)
        x = conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                 force_fp=True)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        skips = []
        for stage, (planes, n_blocks) in enumerate(
                zip((64, 128, 256, 512), layers)):
            s_int8 = self.int8 and (self.int8_stages is None
                                    or bool(self.int8_stages[stage]))
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block(planes, stride, dtype=self.dtype,
                          int8=s_int8, int8_static=self.int8_static)(x, train=train)
            skips.append(x)

        if return_skips:
            return x, skips[:-1]
        return x
