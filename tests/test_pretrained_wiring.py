"""Pretrained-backbone wiring (VERDICT r4 #7).

The reference trains every shipped config from an ImageNet backbone
(gdrn_base.py BACKBONE.PRETRAINED="torchvision://resnet34", loaded in
GDRN.py:836-851); training it from scratch is a measured failing regime
(PERF.md run D). The shipped configs must therefore (a) reference the
pretrained backbone, (b) FAIL LOUDLY when the checkpoint is absent
rather than silently training from scratch, and (c) actually load a
local .pth end-to-end through the resolver.
"""

import importlib.util
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from rdpn6d_tpu.utils.torch_convert import (  # noqa: E402
    load_pretrained_backbone,
    resolve_pretrained,
)


def _load_cfg(name):
    path = os.path.join(os.path.dirname(__file__), "..", "configs", name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("cfg_file", ["lm13.py", "lmo.py", "ycbv.py",
                                      "mp6d.py", "hb.py", "tudl.py"])
def test_shipped_configs_reference_pretrained(cfg_file):
    cfg = _load_cfg(cfg_file).get_config()
    assert cfg.backbone.pretrained == "torchvision://resnet34"


def test_so_configs_reference_pretrained():
    cfg = _load_cfg("so.py").get_config("lm/ape")
    assert cfg.backbone.pretrained == "torchvision://resnet34"


def test_missing_checkpoint_fails_loudly(monkeypatch, tmp_path):
    monkeypatch.setenv("RDPN6D_PRETRAINED_DIR", str(tmp_path / "nothing"))
    monkeypatch.setenv("TORCH_HOME", str(tmp_path / "nohome"))
    monkeypatch.setenv("RDPN6D_DATA_ROOT", str(tmp_path / "nodata"))
    with pytest.raises(FileNotFoundError, match="from scratch"):
        resolve_pretrained("torchvision://resnet34", depth=34)
    with pytest.raises(FileNotFoundError, match="convert_checkpoint"):
        resolve_pretrained(str(tmp_path / "missing.pkl"))
    with pytest.raises(ValueError, match="scheme"):
        resolve_pretrained("s3://bucket/x.pth")
    assert resolve_pretrained("") == ""


def test_flagship_config_loads_local_pth(monkeypatch, tmp_path):
    """torchvision://resnet34 resolves against $RDPN6D_PRETRAINED_DIR and
    the weights land in the flagship config's backbone subtree."""
    torch = pytest.importorskip("torch")
    from tests.test_torch_convert import synthetic_state_dict
    from rdpn6d_tpu.models.resnet import ResNetTrunk

    cfg = _load_cfg("lm13.py").get_config()
    sd = synthetic_state_dict(cfg.backbone.depth)
    pdir = tmp_path / "pre"
    pdir.mkdir()
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               str(pdir / "resnet34-imagenet.pth"))
    monkeypatch.setenv("RDPN6D_PRETRAINED_DIR", str(pdir))

    trunk = ResNetTrunk(cfg.backbone.depth, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = trunk.init(jax.random.PRNGKey(0), x, train=False)
    v = {"params": {"backbone": v["params"]},
         "batch_stats": {"backbone": v["batch_stats"]}}
    v = load_pretrained_backbone(v, cfg.backbone.pretrained,
                                 depth=cfg.backbone.depth)
    got = np.asarray(v["params"]["backbone"]["Conv_0"]["kernel"])
    want = sd["conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
