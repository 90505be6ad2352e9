#!/usr/bin/env python
"""Synthetic-cube overfit run: the full Trainer stack on real hardware.

Renders N cube views, preprocesses on device, trains the flagship-shaped
model to overfit, then evaluates ADD/re/te on the training views. Serves as
the learning-dynamics validation the reference can only do with full
datasets, and exercises Trainer + checkpointing + writers end-to-end.

Usage: python tools/overfit_synth.py [--steps 300] [--n-views 16]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _tetra_mesh():
    """Irregular ASYMMETRIC tetrahedron (meters) — the make_mini_bop
    'ape' object; its orientation is fully identifiable from geometry,
    unlike the cube's 24-fold-ambiguous faces."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_mini_bop import build_meshes

    v, f = build_meshes()[1]  # obj 1 = ape
    return (v / 1000.0).astype(np.float32), f


def build_scenes(cfg, n_views, num_regions, seed=0, mesh="cube"):
    import cv2
    import jax
    import jax.numpy as jnp

    from rdpn6d_tpu.data.pipeline import preprocess_batch
    from rdpn6d_tpu.data.synthetic import cube_points, render_cube_depth
    from rdpn6d_tpu.ops.fps import fps_numpy

    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float32)
    if mesh == "cube":
        pts = cube_points(n_per_edge=9)
        extent = np.array([0.1, 0.1, 0.1], np.float32)
    else:
        verts, faces = _tetra_mesh()
        from rdpn6d_tpu.ops.rasterizer import render_mesh

        pts = verts
        extent = (verts.max(0) - verts.min(0)).astype(np.float32)
    fps = pts[fps_numpy(pts, num_regions)]
    rng = np.random.RandomState(seed)
    samples = []
    poses = []
    for _ in range(n_views):
        R = cv2.Rodrigues(rng.randn(3) * 0.8)[0].astype(np.float32)
        t = np.array([rng.uniform(-0.08, 0.08), rng.uniform(-0.06, 0.06),
                      rng.uniform(0.5, 1.0)], np.float32)
        if mesh == "cube":
            depth, xyz = render_cube_depth(R, t, K, 480, 640,
                                           n_samples=160)
            mask = (depth > 0).astype(np.float32)
            rgb = np.dstack([mask * 180 + 40] * 3) \
                + rng.rand(480, 640, 3).astype(np.float32) * 30
        else:
            depth, xyz = render_mesh(verts, faces, K, R, t, 480, 640)
            mask = (depth > 0).astype(np.float32)
            # NOCS-style albedo: RGB carries model-coordinate signal
            albedo = (xyz / extent + 0.5) * 175.0 + 40.0
            rgb = np.where(mask[..., None] > 0, albedo,
                           rng.rand(480, 640, 3) * 60.0)
        ys, xs = np.nonzero(mask)
        proj = K @ t
        samples.append({
            "rgb": rgb.astype(np.float32), "depth": depth, "xyz": xyz,
            "mask_visib": mask, "K": K,
            "bbox": np.array([xs.min(), ys.min(), xs.max(), ys.max()],
                             np.float32),
            "gt_rot": R, "gt_trans": t, "fps": fps.astype(np.float32),
            "extent": extent,
            "centroid_2d": (proj[:2] / proj[2]).astype(np.float32),
        })
        poses.append((R, t))
    stacked = {k: jnp.asarray(np.stack([s[k] for s in samples]))
               for k in samples[0]}
    batch = preprocess_batch(cfg, stacked, jax.random.PRNGKey(1),
                             train=True)
    b = n_views
    batch["roi_points"] = jnp.asarray(
        np.tile(pts[rng.choice(len(pts), 256)][None], (b, 1, 1)))
    batch["sym_rots"] = jnp.asarray(
        np.tile(np.eye(3, dtype=np.float32), (b, 4, 1, 1)))
    batch["roi_cls"] = jnp.zeros((b,), jnp.int32)
    return batch, pts, poses


def _cube_sym_rotations() -> np.ndarray:
    """All 24 proper rotations of the cube (the octahedral group):
    signed axis permutations with determinant +1."""
    import itertools

    rots = []
    for perm in itertools.permutations(range(3)):
        for signs in itertools.product((1.0, -1.0), repeat=3):
            R = np.zeros((3, 3), np.float32)
            for i, (p, s) in enumerate(zip(perm, signs)):
                R[i, p] = s
            if np.linalg.det(R) > 0:
                rots.append(R)
    assert len(rots) == 24
    return np.stack(rots)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--n-views", type=int, default=16)
    p.add_argument("--out", default="/tmp/overfit_synth")
    p.add_argument("--small", action="store_true",
                   help="tiny model (CPU-friendly)")
    p.add_argument("--int8", action="store_true",
                   help="also evaluate the trained weights through the "
                        "W8A8 int8 serving mode (models/quant.py)")
    p.add_argument("--kabsch", action="store_true",
                   help="also evaluate with the on-device RANSAC-Kabsch "
                        "geometric refinement (ops/ransac_kabsch.py)")
    p.add_argument("--mesh", choices=("cube", "tetra"), default="cube",
                   help="cube = 24-fold symmetric solid (rotation only "
                        "identifiable up to symmetry); tetra = irregular "
                        "ASYMMETRIC mesh — the rig for judging whether "
                        "Kabsch refinement helps/hurts real rotations")
    p.add_argument("--init", choices=("fan_in", "reference"),
                   default="fan_in",
                   help="head/PnP init scheme: the gate uses fan_in "
                        "(reference tiny normal(0.001) init cannot learn "
                        "rotation in a 300-step rig); --init reference at "
                        "a LONG --steps horizon is the convergence-"
                        "evidence rig for the production default "
                        "(VERDICT r3 #8)")
    p.add_argument("--lr", type=float, default=0.0003)
    p.add_argument("--seed", type=int, default=0,
                   help="scene-render + train seed (multi-seed gate runs, "
                        "VERDICT r3 #4)")
    p.add_argument("--int8-stages", action="store_true",
                   help="with --int8: also evaluate trunk0..trunk3 "
                        "(quantize ONE trunk stage at a time) for the "
                        "per-stage rotation-sensitivity attribution")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp

    from rdpn6d_tpu.config import Config
    from rdpn6d_tpu.engine.trainer import Trainer
    from rdpn6d_tpu.evaluation import PoseEvaluator, format_table
    from rdpn6d_tpu.models import RDPN
    from rdpn6d_tpu.parallel import make_eval_step

    opts = ["solver.warmup_iters=10", f"solver.base_lr={args.lr}",
            f"train.seed={args.seed}",
            f'train.output_dir="{args.out}"', "train.log_period=25",
            "data.color_aug_prob=0.0",
            # a 300-step overfit cannot move the reference tiny-init
            # (gradients start ~1e-5-scale); the gate tests the PIPELINE,
            # not the init scheme (config.HeadConfig.init)
            f'head.init="{args.init}"']
    if args.small:
        opts += ["backbone.depth=18", "backbone.input_res=64",
                 "head.out_res=16", "head.num_regions=8",
                 "head.num_filters=32", "data.input_res=64",
                 "data.out_res=16"]
    cfg = Config().apply_opts(opts)

    batch, model_pts, poses = build_scenes(cfg, args.n_views,
                                           cfg.head.num_regions,
                                           seed=args.seed, mesh=args.mesh)
    model = RDPN(cfg, dtype=jnp.bfloat16 if not args.small
                 else jnp.float32)
    variables = model.init(jax.random.PRNGKey(args.seed), batch,
                           train=False)

    trainer = Trainer(cfg, model, variables, total_iters=args.steps)

    def loader():
        while True:
            yield batch

    state = trainer.train(loader(), start_iter=0)

    modes = [("bf16", model, False)]
    if args.kabsch:
        modes.append(("bf16+kabsch", model, True))
    if args.int8:
        grans = ["all", "trunk", "head"]
        if args.int8_stages:
            grans += [f"trunk{s}" for s in range(4)]
        for gran in grans:
            modes.append((f"int8-{gran}",
                          RDPN(cfg, dtype=model.dtype, int8=gran), False))
        # static-calibrated scales (models/quant.calibrate_quant):
        # removes the dynamic absmax reductions — the measured fusion
        # blocker that made dynamic int8 net-slower than bf16 (PERF.md)
        from rdpn6d_tpu.models.quant import calibrate_quant

        for gran, static in (("all", True), ("head", True),
                             # per-input-channel calibrated scales,
                             # absorbed into the weights — the rescue
                             # attempt for trunk modes, where per-tensor
                             # scales lose rotation (PERF.md round 3)
                             ("all", "per_channel"),
                             ("trunk", "per_channel")):
            m_s = RDPN(cfg, dtype=model.dtype, int8=gran,
                       int8_static=static)
            q = calibrate_quant(m_s, state.params, state.batch_stats,
                                [batch])
            sfx = "static" if static is True else "staticpc"
            modes.append((f"int8-{gran}-{sfx}", (m_s, q), False))
    for tag, eval_model, use_kabsch in modes:
        quant = None
        if isinstance(eval_model, tuple):
            eval_model, quant = eval_model
        eval_step = make_eval_step(cfg, eval_model, use_kabsch=use_kabsch,
                                   quant=quant)
        out = eval_step(state, batch)
        # cube: score rotations sym-aware (24-fold-symmetric solid —
        # pure-geometry refinement may legitimately settle on a
        # symmetry-equivalent orientation). tetra: NO symmetry bank —
        # re/proj judge the true rotation.
        if args.mesh == "cube":
            sym = _cube_sym_rotations()
        else:
            sym = np.eye(3, dtype=np.float32)[None]
        d2 = ((model_pts[:, None] - model_pts[None]) ** 2).sum(-1)
        ev = PoseEvaluator(models={args.mesh: model_pts},
                           diameters={args.mesh: float(np.sqrt(d2.max()))},
                           sym_rots={args.mesh: sym})
        for i, (R, t) in enumerate(poses):
            ev.process(args.mesh, np.asarray(out["rot_ego"][i]),
                       np.asarray(out["trans"][i]), R, t,
                       np.asarray(batch["roi_cam"][i]), im_id=i)
        res = ev.evaluate()
        print(format_table(res))
        rec = res["per_obj"][args.mesh]
        print(f"RESULT[{tag}] ad_10={rec['ad_10']:.1f} "
              f"re_5={rec['re_5']:.1f} te_2={rec['te_2']:.1f} "
              f"AUCad={rec['AUCad']:.1f}")


if __name__ == "__main__":
    main()
