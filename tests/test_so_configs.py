"""Parametric single-object (SO) config family (configs/so.py).

Counterpart coverage for the reference's configs/gdrn/*SO/ per-object
config files: every (dataset, object) variant must resolve to registered
train/test splits and a single-class model config.
"""

import pytest

from rdpn6d_tpu.config import load_config
from rdpn6d_tpu.data.bop import get_split
from rdpn6d_tpu.data.refs import get_ref

FAMILIES = ("lm", "lmo", "ycbv", "mp6d", "tless", "tudl",
            "itodd", "icbin", "hb")


@pytest.mark.parametrize("dataset", FAMILIES)
def test_every_object_variant_resolves(dataset):
    ref = get_ref(dataset)
    objs = ref.objects if dataset != "lm" else [
        o for o in ref.objects if o not in ("bowl", "cup")]
    for obj in objs:
        cfg = load_config(f"configs/so.py:{dataset}/{obj}")
        assert cfg.head.num_classes == 1
        assert not cfg.head.rot_class_aware
        for name in (*cfg.data.train_datasets, *cfg.data.train2_datasets,
                     *cfg.data.test_datasets):
            sp = get_split(name)
            # SO train splits restrict to the single object (test splits
            # for lmo/tless/tudl score the shared bop test set)
            if name in cfg.data.train_datasets and sp.objs:
                assert sp.objs == (obj,)
        if cfg.data.train2_datasets:
            assert 0.0 < cfg.data.train2_ratio <= 1.0


def test_unknown_variant_fails_fast():
    with pytest.raises(ValueError, match="SO variant"):
        load_config("configs/so.py:nope/ape")
    with pytest.raises(ValueError, match="no object"):
        load_config("configs/so.py:tudl/ape")


def test_auto_output_dir():
    from rdpn6d_tpu.main import auto_output_dir
    assert auto_output_dir("configs/lm13.py") == "output/lm13"
    assert auto_output_dir("configs/so.py:tudl/can") == "output/so/tudl/can"
    assert auto_output_dir("exp.py") == "output/exp"
    # absolute config paths must not escape the output/ prefix
    assert auto_output_dir("/root/repo/configs/so.py:tudl/can") \
        == "output/so/tudl/can"
    assert auto_output_dir("/abs/exp.py") == "output/exp"


def test_variant_suffix_only_split_when_path_missing(tmp_path):
    # a real path containing ':' would not be split
    p = tmp_path / "weird:name.py"
    p.write_text("from rdpn6d_tpu.config import Config\n"
                 "def get_config():\n    return Config(exp_name='w')\n")
    cfg = load_config(str(p))
    assert cfg.exp_name == "w"


def test_all_full_dataset_configs_load():
    """Every full-dataset config module loads, points at registered
    splits, and has a num_classes matching its dataset ref."""
    from rdpn6d_tpu.config import load_config
    from rdpn6d_tpu.data.bop import get_split
    from rdpn6d_tpu.data.refs import get_ref

    expect_nc = {"lm13": 13, "lmo": 8, "ycbv": 21, "mp6d": 20,
                 "tless": 30, "tudl": 3, "itodd": 28, "hb": 33,
                 "icbin": 2, "mini": 1}
    for name, nc in expect_nc.items():
        cfg = load_config(f"configs/{name}.py")
        if name not in ("mini",):
            assert cfg.head.num_classes == nc, name
        for split_name in (*cfg.data.train_datasets,
                           *cfg.data.train2_datasets,
                           *cfg.data.test_datasets):
            split = get_split(split_name)  # raises on unknown
            ref = get_ref(split.ref_name)
            if name not in ("lm13", "lmo", "mini") and split.objs == ():
                # full-dataset split: num_classes covers every object
                assert cfg.head.num_classes == len(ref.obj_ids), \
                    (name, split_name)
