"""Color augmentation: op semantics, determinism, bounds."""

import jax
import jax.numpy as jnp
import numpy as np

from rdpn6d_tpu.data.augment import (
    AugOp,
    DEFAULT_AUG,
    color_augment,
)


def test_augment_bounds_and_determinism():
    img = jnp.asarray(np.random.RandomState(0).rand(32, 32, 3) * 255,
                      jnp.float32)
    k = jax.random.PRNGKey(0)
    a1 = color_augment(img, k, DEFAULT_AUG)
    a2 = color_augment(img, k, DEFAULT_AUG)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert float(jnp.min(a1)) >= 0.0 and float(jnp.max(a1)) <= 255.0
    # different keys differ
    a3 = color_augment(img, jax.random.PRNGKey(1), DEFAULT_AUG)
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_add_op_shifts_mean():
    img = jnp.full((16, 16, 3), 100.0)
    op = (AugOp("add", prob=1.0, lo=50.0, hi=50.0),)
    out = color_augment(img, jax.random.PRNGKey(0), op)
    np.testing.assert_allclose(np.asarray(out), 150.0, atol=1e-4)


def test_multiply_op():
    img = jnp.full((16, 16, 3), 100.0)
    op = (AugOp("multiply", prob=1.0, lo=0.5, hi=0.5),)
    out = color_augment(img, jax.random.PRNGKey(0), op)
    np.testing.assert_allclose(np.asarray(out), 50.0, atol=1e-4)


def test_blur_preserves_constant():
    img = jnp.full((16, 16, 3), 77.0)
    op = (AugOp("blur", prob=1.0, lo=1.0, hi=1.0),)
    out = color_augment(img, jax.random.PRNGKey(0), op)
    np.testing.assert_allclose(np.asarray(out), 77.0, atol=1e-3)


def test_prob_zero_is_identity():
    img = jnp.asarray(np.random.RandomState(1).rand(16, 16, 3) * 255,
                      jnp.float32)
    ops = tuple(AugOp(o.kind, prob=0.0, lo=o.lo, hi=o.hi)
                for o in DEFAULT_AUG)
    out = color_augment(img, jax.random.PRNGKey(0), ops)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_named_pipelines():
    """COLOR_AUG_TYPE families resolve to distinct declarative pipelines
    (reference base_data_loader.py:154-239)."""
    import pytest

    from rdpn6d_tpu.data.augment import (AAE_AUG, CODE_AUG, LM_AUG,
                                         get_aug_pipeline)

    assert get_aug_pipeline("aae") == AAE_AUG
    assert get_aug_pipeline("code") == CODE_AUG
    # AAE = code ops + the coarse dropout in front
    assert AAE_AUG[0].kind == "dropout" and AAE_AUG[1:] == CODE_AUG
    # lm (lm13's config string) is the weak family without dropout
    assert all(o.kind != "dropout" for o in LM_AUG)
    assert get_aug_pipeline("none") == ()
    assert len(get_aug_pipeline("roi10d")) == 4
    with pytest.raises(ValueError, match="color_aug_type"):
        get_aug_pipeline("albu_unknown")


def test_saturation_blends_toward_gray():
    img = jnp.zeros((8, 8, 3)).at[..., 0].set(200.0)  # pure red
    op = (AugOp("saturation", prob=1.0, lo=0.0, hi=0.0),)  # full desat
    out = np.asarray(color_augment(img, jax.random.PRNGKey(0), op))
    gray = 200.0 * 0.299
    np.testing.assert_allclose(out, gray, atol=1e-3)


def test_contrast_gray_blends_toward_mean():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(8, 8, 3) * 255, jnp.float32)
    op = (AugOp("contrast_gray", prob=1.0, lo=0.0, hi=0.0),)
    out = np.asarray(color_augment(img, jax.random.PRNGKey(0), op))
    gs = float(jnp.mean(img @ jnp.asarray([0.299, 0.587, 0.114])))
    np.testing.assert_allclose(out, gs, atol=1e-3)


def test_lighting_adds_bounded_noise():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(16, 16, 3) * 255, jnp.float32)
    op = (AugOp("lighting", prob=1.0, lo=0.3, hi=0.3),)
    out = np.asarray(color_augment(img, jax.random.PRNGKey(3), op))
    diff = out - np.asarray(jnp.clip(img, 0, 255))
    # a per-image constant channel shift (PCA noise is spatially uniform)
    per_px = diff.reshape(-1, 3)
    inside = (out.reshape(-1, 3) > 0).all(1) & (out.reshape(-1, 3)
                                                < 255).all(1)
    if inside.sum() > 10:
        assert np.allclose(per_px[inside], per_px[inside][0], atol=1e-2)


def test_config_selects_pipeline():
    """preprocess_roi consumes cfg.data.color_aug_type /
    cfg.data.color_aug_ops instead of a hardcoded pipeline."""
    from rdpn6d_tpu.config import Config
    from rdpn6d_tpu.data.pipeline import preprocess_roi

    rng = np.random.RandomState(0)
    H, W = 64, 64
    sample = {
        "rgb": rng.rand(H, W, 3).astype(np.float32) * 255,
        "depth": np.full((H, W), 0.7, np.float32),
        "K": np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]],
                      np.float32),
        "bbox": np.array([10, 10, 50, 50], np.float32),
        "fps": rng.rand(4, 3).astype(np.float32),
        "extent": np.array([0.1, 0.1, 0.1], np.float32),
        "centroid_2d": np.array([30.0, 30.0], np.float32),
        "xyz": np.zeros((H, W, 3), np.float32),
        "mask_visib": np.ones((H, W), np.float32),
        "gt_rot": np.eye(3, dtype=np.float32),
        "gt_trans": np.array([0, 0, 0.7], np.float32),
    }
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    key = jax.random.PRNGKey(0)

    base = Config().apply_opts([
        "data.input_res=32", "data.out_res=8", "head.num_regions=4"])
    cfg_off = base.apply_opts(["data.color_aug_prob=0.0"])
    cfg_none = base.apply_opts(["data.color_aug_prob=1.0",
                                'data.color_aug_type="none"'])
    cfg_aae = base.apply_opts(["data.color_aug_prob=1.0",
                               'data.color_aug_type="aae"'])
    cfg_code = base.apply_opts(["data.color_aug_prob=1.0",
                                'data.color_aug_type="code"'])
    o_off = preprocess_roi(cfg_off, sample, key, train=True)
    o_none = preprocess_roi(cfg_none, sample, key, train=True)
    o_aae = preprocess_roi(cfg_aae, sample, key, train=True)
    o_code = preprocess_roi(cfg_code, sample, key, train=True)
    # "none" pipeline leaves pixels untouched even at prob=1
    np.testing.assert_array_equal(np.asarray(o_off["roi_img"]),
                                  np.asarray(o_none["roi_img"]))
    # distinct families produce distinct pixels
    assert not np.array_equal(np.asarray(o_aae["roi_img"][..., :3]),
                              np.asarray(o_off["roi_img"][..., :3]))
    assert not np.array_equal(np.asarray(o_aae["roi_img"][..., :3]),
                              np.asarray(o_code["roi_img"][..., :3]))
    # depth channels are never color-augmented
    np.testing.assert_allclose(np.asarray(o_aae["roi_img"][..., 3:]),
                               np.asarray(o_off["roi_img"][..., 3:]),
                               atol=1e-6)

    # custom AugOp tuple overrides the named family
    cfg_custom = base.apply_opts(["data.color_aug_prob=1.0"]).replace_data(
        color_aug_ops=(AugOp("add", prob=1.0, lo=30.0, hi=30.0),)) \
        if hasattr(base, "replace_data") else None
    if cfg_custom is None:
        import dataclasses
        d = dataclasses.replace(
            base.data, color_aug_prob=1.0,
            color_aug_ops=(AugOp("add", prob=1.0, lo=30.0, hi=30.0),))
        cfg_custom = dataclasses.replace(base, data=d)
    o_custom = preprocess_roi(cfg_custom, sample, key, train=True)
    got = np.asarray(o_custom["roi_img"][..., :3])
    want = np.minimum(np.asarray(o_off["roi_img"][..., :3])
                      * 255.0 + 30.0, 255.0) / 255.0
    np.testing.assert_allclose(got, want, atol=1e-4)
