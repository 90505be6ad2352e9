"""Mini rehearsal experiment over the generated 3-object dataset.

Full-protocol rehearsal config (tools/make_mini_bop.py writes the data,
tools/rehearse_protocol.py drives the chain): flagship architecture and
losses, three objects (ape = asymmetric tetra, can = symmetric cube,
driller = L-prism), BOP19 AR scoring incl. VSD. The closest available
proxy — with no real BOP dataset on this machine — for "the assembled
protocol produces a sane number" (reference bars: readme.md:125-263).
"""

from rdpn6d_tpu.config import Config


def get_config() -> Config:
    cfg = Config(exp_name="mini")
    return cfg.apply_opts([
        'data.train_datasets=["lm_mini_train"]',
        'data.test_datasets=["lm_mini_test"]',
        "data.color_aug_prob=0.2",
        'data.color_aug_type="code"',
        "solver.ims_per_batch=24",
        "solver.total_epochs=120",
        "solver.warmup_iters=100",
        "loss.pm_loss_sym=true",
        # short-horizon run (~1-2k iters): the reference tiny-init leaves
        # gradients too small to learn rotation this fast (config.py)
        'head.init="fan_in"',
        'test.error_types="ad,adi,AUCad,re,te,proj,vsd,mssd,mspd"',
        'train.output_dir="output/mini"',
    ])
