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


def stem_kernel_to_s2d(k7):
    """Remap a [7,7,C,O] stride-2 stem kernel to the exactly equivalent
    [4,4,4C,O] space-to-depth(2) stride-1 kernel (tap a = 2*ku + di - 1;
    taps outside 0..6 are the structural zeros of the 8-wide cover)."""
    import numpy as np

    k7 = np.asarray(k7)
    C, O = k7.shape[2], k7.shape[3]
    k4 = np.zeros((4, 4, 4 * C, O), k7.dtype)
    for ku in range(4):
        for kv in range(4):
            for di in range(2):
                for dj in range(2):
                    au, av = 2 * ku + di - 1, 2 * kv + dj - 1
                    if 0 <= au < 7 and 0 <= av < 7:
                        blk = (di * 2 + dj) * C
                        k4[ku, kv, blk:blk + C, :] = k7[au, av]
    return k4


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H/b,W/b,b*b*C]; channel index = (di*b+dj)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // block, block, W // block, block, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // block, W // block, block * block * C)


class ResNetTrunk(nn.Module):
    """conv7x7/2 + maxpool/2 + 4 stages. 256^2 input -> 8x8 final feature.

    ``space_to_depth``: replace the 7x7/s2 stem conv with an EXACTLY
    equivalent space-to-depth(2) + 4x4/s1 conv (same math incl. the zero
    border taps — see ``stem_kernel_to_s2d`` for the tap remap and
    tests/test_s2d.py for the numerical pin). Why: the thin 3-channel
    256^2 stem is the measured 15-20%-MFU trunk culprit (PERF.md round 4
    bench_bn); packing 2x2 pixel blocks into channels quarters the
    spatial extent and 4x's the contraction depth, which the MXU tiles
    far better. The param tree changes shape ([4,4,12,64] vs [7,7,3,64])
    but checkpoints convert losslessly in either direction.
    """

    depth: int = 34
    dtype: Any = jnp.float32
    int8: bool = False              # W8A8 serving mode (models/quant.py)
    int8_static: Any = False        # False | True | "per_channel"
    int8_stages: Any = None         # None = all stages when int8; else a
    # 4-tuple of bools selecting which stages quantize (per-stage int8
    # sensitivity attribution, PERF.md round 4)
    s2d_stem: bool = False          # opt-in (backbone.space_to_depth)

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
        if self.s2d_stem:
            # conv7x7/s2(pad 3) == s2d(2) + conv4x4/s1(pad (2,1)): output
            # position i taps x[2i-4 .. 2i+3] (the -4 tap is a structural
            # zero in the remapped kernel), identical to the 7-tap window
            # x[2i-3 .. 2i+3] with identical zero-border semantics
            x = space_to_depth(x, 2)
            x = conv(64, (4, 4), strides=(1, 1),
                     padding=((2, 1), (2, 1)), use_bias=False,
                     force_fp=True)(x)
        else:
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
