"""Color augmentation: a safe declarative, JAX-native pipeline.

Counterpart of the reference's ``eval``-ed imgaug code strings
(base_data_loader.py:194-239 — SURVEY.md flags the eval() as a quirk not to
replicate) and the AAE augmentor. The shipped pipelines
(configs/gdrn/mp6d/a.py:10-24, lm/a6_cPnP_lm13.py:8-19) compose, each with a
probability: GaussianBlur, Add, Invert, Multiply (optionally per-channel),
LinearContrast, CoarseDropout. Here the same ops are pure jax functions
driven by an ``AugSpec`` tuple — jit/vmap-safe, deterministic under a PRNG
key, running on device alongside the preprocessing graph.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugOp:
    kind: str                       # blur | add | invert | multiply | contrast | dropout
    prob: float = 0.5
    lo: float = 0.0
    hi: float = 1.0
    per_channel: float = 0.0        # probability of sampling per channel


# The strong ops shared by the shipped per-config "code" strings
# (ycbv AugAAETrunc / mp6d a.py / lmo: blur 1.2*rand, Add +-25 pc0.3,
# Invert 0.2 pc, Multiply 0.6-1.4 x2, LinearContrast 0.5-2.2 pc0.3 —
# CoarseDropout is commented out there)
CODE_AUG: tuple[AugOp, ...] = (
    AugOp("blur", prob=0.5, lo=0.0, hi=1.2),
    AugOp("add", prob=0.5, lo=-25.0, hi=25.0, per_channel=0.3),
    AugOp("invert", prob=0.3, lo=0.2, hi=0.2, per_channel=1.0),
    AugOp("multiply", prob=0.5, lo=0.6, hi=1.4, per_channel=0.5),
    AugOp("multiply", prob=0.5, lo=0.6, hi=1.4),
    AugOp("contrast", prob=0.5, lo=0.5, hi=2.2, per_channel=0.3),
)

# The AAE family's built-in string (base_data_loader.py:166-177): the
# strong ops WITH the coarse dropout
AAE_AUG: tuple[AugOp, ...] = (
    AugOp("dropout", prob=0.5, lo=0.2, hi=0.05),   # p=0.2, size_percent=0.05
) + CODE_AUG

# Weaker variant for dark objects (base_data_loader.py:184-193,
# aug_code_weaker: dropout 0.1, blur rand, Add +-20, contrast 0.5-2.0)
AAE_WEAK_AUG: tuple[AugOp, ...] = (
    AugOp("dropout", prob=0.4, lo=0.1, hi=0.05),
    AugOp("blur", prob=0.5, lo=0.0, hi=1.0),
    AugOp("add", prob=0.5, lo=-20.0, hi=20.0, per_channel=0.3),
    AugOp("invert", prob=0.4, lo=0.2, hi=0.2, per_channel=1.0),
    AugOp("multiply", prob=0.5, lo=0.7, hi=1.4, per_channel=0.8),
    AugOp("multiply", prob=0.5, lo=0.7, hi=1.4),
    AugOp("contrast", prob=0.5, lo=0.5, hi=2.0, per_channel=0.3),
)

# lm13's config code string (configs/gdrn/lm/a6_cPnP_lm13.py:8-19):
# the weak ops without the dropout
LM_AUG: tuple[AugOp, ...] = AAE_WEAK_AUG[1:]

# ROI10D's AugmentRGB (core/utils/augment.py:233-263): small
# saturation/brightness/contrast jitters + PCA lighting noise. Always-on
# ops (AugmentRGB applies each unconditionally); lo/hi bound the blend
# factor, `lo` is the lighting std.
ROI10D_AUG: tuple[AugOp, ...] = (
    AugOp("saturation", prob=1.0, lo=0.95, hi=1.05),
    AugOp("brightness_mul", prob=1.0, lo=0.99, hi=1.01),  # delta 2.5/255
    AugOp("contrast_gray", prob=1.0, lo=0.95, hi=1.05),
    AugOp("lighting", prob=1.0, lo=0.3, hi=0.3),
)

# back-compat alias (the pre-round-3 hardcoded pipeline)
DEFAULT_AUG: tuple[AugOp, ...] = AAE_AUG

_PIPELINES: dict[str, tuple[AugOp, ...]] = {
    "code": CODE_AUG,
    "aae": AAE_AUG,
    "aae_weak": AAE_WEAK_AUG,
    "lm": LM_AUG,
    "roi10d": ROI10D_AUG,
    "none": (),
}


def get_aug_pipeline(name: str) -> tuple[AugOp, ...]:
    """Named pipeline lookup (the reference's COLOR_AUG_TYPE families,
    base_data_loader.py:154-239 — minus the eval()'d code strings, which
    are declarative AugOp tuples here; configs can also set
    ``data.color_aug_ops`` to a custom tuple directly)."""
    try:
        return _PIPELINES[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown color_aug_type {name!r}; "
            f"options: {sorted(_PIPELINES)}") from None


def _gaussian_kernel(sigma: jax.Array, radius: int = 3) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    k = jnp.where(sigma < 1e-3, (x == 0).astype(jnp.float32), k)
    return k / jnp.sum(k)


def _sep_conv(img, k):
    pad = len(k) // 2
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="edge")
    x = jax.vmap(jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                          in_axes=1, out_axes=1), in_axes=2, out_axes=2)(x)
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    x = jax.vmap(jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"),
                          in_axes=0, out_axes=0), in_axes=2, out_axes=2)(x)
    return x


def _channel_value(key, op: AugOp, nch: int):
    """Sample a value per-channel with probability op.per_channel else
    shared."""
    k1, k2, k3 = jax.random.split(key, 3)
    per = jax.random.bernoulli(k1, op.per_channel)
    v_ch = jax.random.uniform(k2, (nch,), minval=op.lo, maxval=op.hi)
    v_sh = jax.random.uniform(k3, (), minval=op.lo, maxval=op.hi)
    return jnp.where(per, v_ch, v_sh)


def _apply_op(img: jax.Array, key: jax.Array, op: AugOp) -> jax.Array:
    """img [H, W, 3] in 0..255."""
    kp, kv = jax.random.split(key)
    nch = img.shape[-1]
    if op.kind == "blur":
        out = _sep_conv(img, _gaussian_kernel(
            jax.random.uniform(kv, (), minval=op.lo, maxval=op.hi)))
    elif op.kind == "add":
        out = img + _channel_value(kv, op, nch)
    elif op.kind == "multiply":
        out = img * _channel_value(kv, op, nch)
    elif op.kind == "invert":
        k1, k2 = jax.random.split(kv)
        flip = jax.random.bernoulli(k1, op.lo, (nch,))
        out = jnp.where(flip, 255.0 - img, img)
    elif op.kind == "contrast":
        v = _channel_value(kv, op, nch)
        out = (img - 127.5) * v + 127.5
    elif op.kind == "dropout":
        # CoarseDropout(p, size_percent): zero coarse cells
        H, W = img.shape[0], img.shape[1]
        ch, cw = max(int(H * op.hi), 1), max(int(W * op.hi), 1)
        k1 = kv
        grid = jax.random.bernoulli(k1, op.lo, (ch, cw))
        mask = jax.image.resize(grid.astype(img.dtype), (H, W), "nearest")
        out = img * (1.0 - mask[..., None])
    elif op.kind == "saturation":
        # blend toward per-pixel grayscale (AugmentRGB.saturation,
        # core/utils/augment.py:233-239)
        gs = img @ jnp.asarray([0.299, 0.587, 0.114])
        a = jax.random.uniform(kv, (), minval=op.lo, maxval=op.hi)
        out = img * a + (1.0 - a) * gs[..., None]
    elif op.kind == "brightness_mul":
        a = jax.random.uniform(kv, (), minval=op.lo, maxval=op.hi)
        out = img * a
    elif op.kind == "contrast_gray":
        # blend toward the scalar gray mean (AugmentRGB.contrast,
        # core/utils/augment.py:248-254)
        gs = jnp.mean(img @ jnp.asarray([0.299, 0.587, 0.114]))
        a = jax.random.uniform(kv, (), minval=op.lo, maxval=op.hi)
        out = img * a + (1.0 - a) * gs
    elif op.kind == "lighting":
        # PCA lighting noise over the image's channel covariance
        # (AugmentRGB.lighting, core/utils/augment.py:256-263); std
        # scaled to the 0..255 domain (the reference works in 0..1)
        flat = img.reshape(-1, 3) / 255.0
        cov = jnp.cov(flat, rowvar=False)
        eigval, eigvec = jnp.linalg.eigh(cov)
        noise = jax.random.normal(kv, (3,)) * op.lo
        out = img + 255.0 * (eigvec @ (eigval * noise))
    else:
        raise ValueError(op.kind)
    on = jax.random.bernoulli(kp, op.prob)
    return jnp.where(on, jnp.clip(out, 0.0, 255.0), img)


@partial(jax.jit, static_argnames=("ops",))
def color_augment(img: jax.Array, key: jax.Array,
                  ops: tuple[AugOp, ...] = DEFAULT_AUG) -> jax.Array:
    """Apply the augmentation pipeline to one [H, W, 3] image (0..255)."""
    keys = jax.random.split(key, len(ops))
    for op, k in zip(ops, keys):
        img = _apply_op(img, k, op)
    return img

# Background replacement + TRUNCATE_FG live in the HOST decoder
# (loader.RecordDecoder, base_data_loader.py:320-364 semantics): the
# truncated visib mask must exist BEFORE device transfer to feed
# mask_trunc, so a device-side copy would duplicate the logic.
