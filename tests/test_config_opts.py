"""CLI dotted-opt parsing + int8 mode validation pins (round-4 review)."""

import numpy as np
import pytest

from rdpn6d_tpu.config import Config


def test_bare_word_bools_coerced():
    cfg = Config().apply_opts(["data.grouped_train=False",
                               "test.use_pnp=True"])
    assert cfg.data.grouped_train is False
    assert cfg.test.use_pnp is True


def test_quoted_string_true_stays_string():
    # an explicitly json-quoted string must NOT be coerced to bool
    cfg = Config().apply_opts(['exp_name="True"'])
    assert cfg.exp_name == "True"


def test_lowercase_json_bools_and_lists():
    cfg = Config().apply_opts(["test.plots=false",
                               'data.train_datasets=["a","b"]'])
    assert cfg.test.plots is False
    assert cfg.data.train_datasets == ("a", "b")


def test_malformed_opt_raises():
    with pytest.raises(ValueError, match="malformed"):
        Config().apply_opts(["solver.amp"])


def test_int8_invalid_trunk_stage_raises():
    from rdpn6d_tpu.models import RDPN

    cfg = Config()
    with pytest.raises(ValueError, match="trunk0..trunk3"):
        RDPN(cfg, int8="trunk4")._trunk_stage_mask
    # valid stage parses; plain names untouched
    assert RDPN(cfg, int8="trunk2")._trunk_stage_mask == (
        False, False, True, False)
    assert RDPN(cfg, int8="trunk")._trunk_stage_mask is None


def test_int8_unknown_mode_raises_at_trace():
    import jax
    import jax.numpy as jnp

    from rdpn6d_tpu.models import RDPN, dummy_batch

    cfg = Config().apply_opts([
        "backbone.depth=18", "backbone.input_res=64", "head.out_res=16",
        "head.num_regions=4", "head.num_filters=32", "data.input_res=64",
        "data.out_res=16"])
    m = RDPN(cfg, dtype=jnp.float32, int8="trunkx")
    with pytest.raises(ValueError, match="expected False"):
        m.init(jax.random.PRNGKey(0), dummy_batch(cfg, 1), train=False)


def test_pad_roi_crops_rectangular():
    """One wide ROI must not inflate the batch to a square of its width."""
    from rdpn6d_tpu.data.loader import _pad_roi_crops

    rois = []
    for h, w in ((10, 100), (30, 20)):
        rois.append({"xyz": np.arange(h * w * 3, dtype=np.float16)
                     .reshape(h, w, 3),
                     "mask_packed": np.ones((h, w), np.uint8),
                     "xyz_offset": np.zeros(2, np.int32)})
    orig = [r["xyz"].copy() for r in rois]
    _pad_roi_crops(rois, 16)
    # batch-max H=30->32, W=100->112 (NOT 112x112 square)
    for r in rois:
        assert r["xyz"].shape == (32, 112, 3)
        assert r["mask_packed"].shape == (32, 112)
    for r, o in zip(rois, orig):
        h, w = o.shape[:2]
        np.testing.assert_array_equal(r["xyz"][:h, :w], o)
        assert r["xyz"][h:].sum() == 0 and r["xyz"][:, w:].sum() == 0
