"""LineMOD-Occluded experiment.

Counterpart of configs/gdrn/lmo/a6_cPnP_AugAAETrunc_BG0.5_lmo_real_pbr0.1_40e.py:
real data + 10% pbr TRAIN2 mixing, background replacement 0.5, truncated-fg
aug, 40 epochs.
"""

from rdpn6d_tpu.config import Config


def get_config() -> Config:
    cfg = Config(exp_name="lmo")
    return cfg.apply_opts([
        'data.train_datasets=["lmo_train"]',
        'data.train2_datasets=["lmo_pbr_train"]',
        "data.train2_ratio=0.1",
        'data.test_datasets=["lmo_bop_test"]',
        "data.color_aug_prob=0.8",
        'data.color_aug_type="code"',  # lmo ...40e.py COLOR_AUG_CODE
        "data.change_bg_prob=0.5",
        "data.truncate_fg=true",
        "head.num_classes=8",
        # Multi-scale skip fusion into the dense head (the reference's
        # ROT_CONCAT option, gdrn_base.py:32 defaults it off). Shipped ON
        # here: the controlled E2 A/B measured 2.7x faster dense-task
        # learning and every passing flagship rehearsal (runs E/F) uses
        # it (PERF.md rounds 4-5). Set false to match reference-default
        # param trees (e.g. for full-model checkpoint conversion).
        "backbone.rot_concat=true",
        "solver.total_epochs=40",
        # ImageNet backbone: the reference default (gdrn_base.py
        # BACKBONE.PRETRAINED="torchvision://resnet34", GDRN.py:836-851).
        # Resolved against local checkpoint dirs at train start; FAILS
        # LOUDLY if absent (utils/torch_convert.resolve_pretrained) --
        # set "" to train from scratch deliberately.
        'backbone.pretrained="torchvision://resnet34"',
        'train.output_dir="output/lmo"',
    ])
