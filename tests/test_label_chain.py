"""Label-chain invariant over the REAL on-disk protocol (slow).

Guards the property that made run C debuggable (PERF.md "run C
post-mortem"): for every foreground pixel of a real grouped train batch,
decoding the pipeline's residual coordinate target back to model frame

    xyz_model = R_gt^T ((coord - 0.5) * extent) + fps[region - 1]

and mapping it into the scale-normalized camera frame

    cam = (R_gt @ xyz_model + t_gt) / resize_ratio

must land on the depth-XYZ input channels the network actually sees
(reference depth /= resize_ratio convention, data_loader.py:753-763),
and the region ids must equal the nearest-fps recomputation. A warp
misalignment between the image crop and the GT-label crop, a dropped
resize_ratio, a permuted fps bank, or a stale xyz cache all fail here.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mini_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("labchain") / "minibop")
    env = dict(os.environ, RDPN6D_DATA_ROOT=root)
    for cmd in (
        [sys.executable, "tools/make_mini_bop.py", "--out", root,
         "--n-train", "6", "--n-test", "2"],
        [sys.executable, "tools/compute_fps.py", "--dataset", "lm",
         "--objs", "ape", "can", "driller"],
        [sys.executable, "tools/gen_xyz_crop.py", "--split",
         "lm_mini_train"],
    ):
        proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                              text=True, timeout=900)
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return root


@pytest.mark.slow
def test_grouped_train_labels_match_depth_input(mini_tree, monkeypatch,
                                                tmp_path):
    monkeypatch.setenv("RDPN6D_DATA_ROOT", mini_tree)
    import jax
    import jax.numpy as jnp

    from rdpn6d_tpu.config import load_config
    from rdpn6d_tpu.data.loader import train_group_iterator
    from rdpn6d_tpu.data.pipeline import preprocess_rois_grouped

    cfg = load_config(
        os.path.join(REPO, "configs", "mini.py"),
        ["data.grouped_train=true",
         f'train.output_dir="{str(tmp_path / "out")}"'])
    it = train_group_iterator(cfg, list(cfg.data.train_datasets), seed=0,
                              batch_size=8,
                              cache_dir=str(tmp_path / "cache"))
    gb = next(it)
    b = preprocess_rois_grouped(
        cfg, {k: jnp.asarray(v) for k, v in gb["frames"].items()},
        {k: jnp.asarray(v) for k, v in gb["rois"].items()},
        jax.random.PRNGKey(0), train=True)
    b = jax.tree.map(np.asarray, b)

    checked = 0
    for i in range(b["roi_xyz"].shape[0]):
        region = b["roi_region"][i]
        depth_xyz = b["roi_coord_2d"][i][..., :3]
        sel = ((b["roi_mask_visib"][i] > 0.5) & (region > 0)
               & (depth_xyz[..., 2] > 1e-6))
        if sel.sum() < 50:
            continue
        R, t = b["gt_rot"][i], b["gt_trans"][i]
        fps, ext = b["fps"][i], b["roi_extent"][i]
        rot_resid = (b["roi_xyz"][i][sel] - 0.5) * ext
        xyz_model = rot_resid @ R + fps[region[sel] - 1]
        cam = (xyz_model @ R.T + t) / b["resize_ratio"][i]
        err = np.linalg.norm(cam - depth_xyz[sel], axis=-1)
        # median pins alignment; the tail holds nearest-resample boundary
        # pixels + f16 GT quantization, so only the bulk is gated
        assert np.median(err) < 5e-3, (i, np.median(err))

        d = np.linalg.norm(xyz_model[:, None]
                           - fps[None, :cfg.head.num_regions], axis=-1)
        agree = (d.argmin(1) + 1 == region[sel]).mean()
        assert agree > 0.99, (i, agree)
        checked += 1
    assert checked >= 4  # the batch must actually exercise the invariant
