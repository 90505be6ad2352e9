"""CLI end-to-end: python -m rdpn6d_tpu.main over a tiny on-disk dataset —
argument parsing, config module loading, record building, Trainer,
checkpointing."""

import json
import os
import textwrap

import numpy as np
import pytest

import rdpn6d_tpu.data.refs as refs_mod
from rdpn6d_tpu.data.synthetic import render_cube_depth


@pytest.fixture()
def tiny_ds(tmp_path):
    import cv2

    sdir = tmp_path / "ds" / "lm" / "train" / "000001"
    (sdir / "rgb").mkdir(parents=True)
    (sdir / "depth").mkdir()
    (sdir / "mask_visib").mkdir()
    # models for asset loading
    from tests.test_eval_runner import write_cube_ply

    mdir = tmp_path / "ds" / "lm" / "models"
    write_cube_ply(str(mdir / "obj_000001.ply"))
    (mdir / "models_info.json").write_text(json.dumps(
        {"1": {"diameter": 173.2, "size_x": 100.0, "size_y": 100.0,
               "size_z": 100.0}}))

    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]])
    gt, cam, info = {}, {}, {}
    rng = np.random.RandomState(0)
    for im_id in range(4):
        R = cv2.Rodrigues(rng.randn(3) * 0.5)[0]
        t = np.array([0.0, 0.0, 0.7])
        depth, _ = render_cube_depth(R, t, K, 480, 640)
        mask = (depth > 0).astype(np.uint8) * 255
        cv2.imwrite(str(sdir / "rgb" / f"{im_id:06d}.png"),
                    np.dstack([mask] * 3))
        cv2.imwrite(str(sdir / "depth" / f"{im_id:06d}.png"),
                    (depth * 1000).astype(np.uint16))
        cv2.imwrite(str(sdir / "mask_visib" / f"{im_id:06d}_000000.png"),
                    mask)
        gt[str(im_id)] = [{"cam_R_m2c": R.flatten().tolist(),
                           "cam_t_m2c": (t * 1000).tolist(), "obj_id": 1}]
        cam[str(im_id)] = {"cam_K": K.flatten().tolist(),
                           "depth_scale": 1.0}
        info[str(im_id)] = [{"visib_fract": 1.0}]
    (sdir / "scene_gt.json").write_text(json.dumps(gt))
    (sdir / "scene_camera.json").write_text(json.dumps(cam))
    (sdir / "scene_gt_info.json").write_text(json.dumps(info))
    return tmp_path


def test_cli_train_two_iters(tiny_ds, monkeypatch):
    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tiny_ds / "ds"))

    cfg_path = tiny_ds / "exp.py"
    out_dir = str(tiny_ds / "out").replace("\\", "/")
    cfg_path.write_text(textwrap.dedent(f"""
        from rdpn6d_tpu.config import Config
        from rdpn6d_tpu.data.bop import Split, register_split

        register_split(Split("cli_tiny_train", "lm", "train",
                             scene_ids=(1,), objs=("ape",)))

        def get_config():
            return Config().apply_opts([
                "backbone.depth=18", "backbone.input_res=64",
                "head.out_res=16", "head.num_regions=4",
                "head.num_filters=32", "data.input_res=64",
                "data.out_res=16", "loss.num_pm_points=64",
                'data.train_datasets=["cli_tiny_train"]',
                "solver.ims_per_batch=2", "solver.total_epochs=1",
                "solver.optimizer=adamw", "solver.warmup_iters=1",
                "train.log_period=1",
                'train.output_dir="{out_dir}"',
            ])
    """))

    from rdpn6d_tpu.main import main

    main(["--config-file", str(cfg_path)])

    # artifacts: config dump, metrics, checkpoint
    assert os.path.exists(os.path.join(out_dir, "config.json"))
    metrics = open(os.path.join(out_dir, "metrics.json")).read().strip()
    assert "total_loss" in metrics
    ckpts = os.listdir(os.path.join(out_dir, "ckpt"))
    assert len(ckpts) >= 1


def test_cli_train_with_pretrained_backbone(tiny_ds, monkeypatch):
    """main.py resolves backbone.pretrained (torchvision:// scheme),
    grafts the weights, and trains — and fails loudly when absent."""
    torch = pytest.importorskip("torch")
    import textwrap as tw

    from tests.test_torch_convert import synthetic_state_dict

    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tiny_ds / "ds"))
    pdir = tiny_ds / "pretrained"
    pdir.mkdir()
    sd = synthetic_state_dict(18)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               str(pdir / "resnet18-f37072fd.pth"))

    cfg_path = tiny_ds / "exp_pre.py"
    out_dir = str(tiny_ds / "out_pre").replace("\\", "/")
    cfg_path.write_text(tw.dedent(f"""
        from rdpn6d_tpu.config import Config
        from rdpn6d_tpu.data.bop import Split, register_split

        register_split(Split("cli_tiny2_train", "lm", "train",
                             scene_ids=(1,), objs=("ape",)))

        def get_config():
            return Config().apply_opts([
                "backbone.depth=18", "backbone.input_res=64",
                'backbone.pretrained="torchvision://resnet18"',
                "head.out_res=16", "head.num_regions=4",
                "head.num_filters=32", "data.input_res=64",
                "data.out_res=16", "loss.num_pm_points=64",
                'data.train_datasets=["cli_tiny2_train"]',
                "solver.ims_per_batch=2", "solver.total_epochs=1",
                "solver.optimizer=adamw", "solver.warmup_iters=1",
                "train.log_period=1",
                'train.output_dir="{out_dir}"',
            ])
    """))

    from rdpn6d_tpu.main import main

    # absent checkpoint dirs -> loud failure, no silent from-scratch run
    monkeypatch.setenv("RDPN6D_PRETRAINED_DIR", str(tiny_ds / "nowhere"))
    monkeypatch.setenv("TORCH_HOME", str(tiny_ds / "nohome"))
    monkeypatch.setenv("RDPN6D_DATA_ROOT", str(tiny_ds / "nodata"))
    with pytest.raises(FileNotFoundError, match="from scratch"):
        main(["--config-file", str(cfg_path)])

    monkeypatch.setenv("RDPN6D_PRETRAINED_DIR", str(pdir))
    main(["--config-file", str(cfg_path)])
    assert "total_loss" in open(
        os.path.join(out_dir, "metrics.json")).read()


def test_cli_train_host_lr_and_horizon_change(tiny_ds, monkeypatch):
    """solver.host_lr end-to-end: train, then RESUME with a longer
    horizon — the use case the knob exists for (the step program carries
    no schedule constants, so the horizon change is a cache hit instead
    of a recompile). The resumed run must restore the
    inject_hyperparams opt_state and keep training."""
    monkeypatch.setattr(refs_mod, "DATA_ROOT", str(tiny_ds / "ds"))

    cfg_path = tiny_ds / "exp_hostlr.py"
    out_dir = str(tiny_ds / "out_hostlr").replace("\\", "/")
    cfg_path.write_text(textwrap.dedent(f"""
        from rdpn6d_tpu.config import Config
        from rdpn6d_tpu.data.bop import Split, register_split

        register_split(Split("cli_tiny_train", "lm", "train",
                             scene_ids=(1,), objs=("ape",)))

        def get_config():
            return Config().apply_opts([
                "backbone.depth=18", "backbone.input_res=64",
                "head.out_res=16", "head.num_regions=4",
                "head.num_filters=32", "data.input_res=64",
                "data.out_res=16", "loss.num_pm_points=64",
                'data.train_datasets=["cli_tiny_train"]',
                "solver.ims_per_batch=2", "solver.total_epochs=1",
                "solver.optimizer=adamw", "solver.warmup_iters=1",
                "solver.host_lr=true",
                "train.log_period=1",
                'train.output_dir="{out_dir}"',
            ])
    """))

    from rdpn6d_tpu.main import main

    main(["--config-file", str(cfg_path)])
    ckpts = os.listdir(os.path.join(out_dir, "ckpt"))
    assert len(ckpts) >= 1

    # horizon change + resume: restores the hyperparams-bearing
    # opt_state and continues to the new total
    main(["--config-file", str(cfg_path), "--resume",
          "--opts", "solver.total_epochs=2"])
    lines = [json.loads(ln) for ln in
             open(os.path.join(out_dir, "metrics.json"))
             if ln.strip()]
    assert any("lr" in ln and ln["lr"] > 0 for ln in lines)
