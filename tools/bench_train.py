#!/usr/bin/env python
"""Training-step throughput + profile harness (flagship shape).

Measures fwd+bwd+optimizer wall time per step at given batch sizes on the
real chip, with the relay-safe methodology from PERF.md (distinct inputs
per iteration, value readback per iteration). ``--profile`` additionally
captures a jax.profiler device trace of a few steps for breakdown work.

Usage:
  python tools/bench_train.py [--batch-sizes 24 96 192] [--iters 12]
      [--remat] [--profile /tmp/train_trace] [--optimizer ranger]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-sizes", type=int, nargs="*",
                   default=[24, 96, 192])
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--optimizer", default="ranger")
    p.add_argument("--profile", default="",
                   help="capture a device trace of 3 steps into this dir")
    p.add_argument("--decompose", action="store_true",
                   help="additionally time fwd-only, fwd+bwd (no opt), "
                        "and optimizer-only — the step-time breakdown "
                        "behind the MFU ceiling argument")
    p.add_argument("--opts", nargs="*", default=[])
    p.add_argument("--grouped-ab", action="store_true",
                   help="A/B the grouped input path at flagship frame "
                        "size: two-program (preprocess jit -> step jit) "
                        "vs fused single program, on identical raw "
                        "inputs (batch-sizes = ROI counts; "
                        "rois_per_frame=5, YCB-V-like density)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from rdpn6d_tpu.config import Config
    from rdpn6d_tpu.data.synthetic import dummy_train_batch
    from rdpn6d_tpu.models import RDPN
    from rdpn6d_tpu.parallel import (create_mesh, create_train_state,
                                     make_sharded_train_step, replicate,
                                     shard_batch)
    from rdpn6d_tpu.solver import build_optimizer

    opts = [f'solver.optimizer="{args.optimizer}"', *args.opts]
    if args.remat:
        opts.append("solver.remat=true")
    cfg = Config().apply_opts(opts)
    mesh = create_mesh(1)

    model = RDPN(cfg, dtype=jnp.bfloat16)
    peak = 197e12  # v5e bf16 (PERF.md: 394 is the int8 figure)

    if args.grouped_ab:
        _grouped_ab(cfg, args, peak)
        return

    for bs in args.batch_sizes:
        batch = dummy_train_batch(cfg, batch_size=bs)
        # distinct inputs per iteration: the relay caches executions with
        # identical (executable, args)
        rng = np.random.RandomState(0)
        imgs = [jnp.asarray(rng.rand(*batch["roi_img"].shape)
                            .astype(np.float32)) for _ in range(4)]

        # jit the init: eager flax init at bench batch sizes dispatches
        # hundreds of per-primitive compiles through the device relay
        # (minutes of wall clock); one compiled program instead
        variables = jax.jit(lambda k, b: model.init(k, b, train=False))(
            jax.random.PRNGKey(0), batch)
        tx = build_optimizer(cfg, total_iters=1000)
        state = replicate(create_train_state(cfg, variables, tx), mesh)
        step_fn = make_sharded_train_step(cfg, model, tx, mesh)
        batch = shard_batch(batch, mesh)

        def run(state, i):
            # the step donates its input state — thread the new one
            b = dict(batch)
            b["roi_img"] = imgs[i % len(imgs)] + (i * 1e-6)
            return step_fn(state, b)

        # FLOPs from XLA cost analysis of the compiled step (before any
        # donation invalidates the sample state)
        try:
            flops = step_fn.lower(state, batch).compile(
                ).cost_analysis()["flops"]
        except Exception:
            flops = 0.0

        # compile + warmup
        for i in range(args.warmup):
            state, metrics = run(state, i)
            float(metrics["total_loss"])  # value readback forces execution

        if args.profile:
            with jax.profiler.trace(args.profile):
                for i in range(3):
                    state, metrics = run(state, i)
                    float(metrics["total_loss"])
            print(f"trace written to {args.profile}")

        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = run(state, i + 7)
            float(metrics["total_loss"])  # per-iter readback (relay-safe)
        dt = (time.perf_counter() - t0) / args.iters
        line = {
            "metric": "train poses/sec/chip (fwd+bwd+%s%s)"
                      % (args.optimizer, "+remat" if args.remat else ""),
            "batch": bs,
            "ms_per_step": round(dt * 1000, 1),
            "value": round(bs / dt, 1),
            "unit": "poses/sec",
            "tflops": round(flops / dt / 1e12, 1) if flops else None,
            "mfu_pct": round(100 * flops / dt / peak, 1) if flops else None,
        }
        print(json.dumps(line), flush=True)

        if not args.decompose:
            continue

        from rdpn6d_tpu.losses import compute_losses

        def time_fn(fn, tag, *fargs):
            for i in range(args.warmup):
                r = fn(i, *fargs)
                float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
            t0 = time.perf_counter()
            for i in range(args.iters):
                r = fn(i + 7, *fargs)
                float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
            d = (time.perf_counter() - t0) / args.iters
            print(json.dumps({"metric": f"decompose/{tag}", "batch": bs,
                              "ms": round(d * 1000, 1)}), flush=True)
            return d

        def loss_of(params, b):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                b, train=True, mutable=["batch_stats"])
            return sum(compute_losses(cfg, out, b).values())

        fwd = jax.jit(loss_of)
        grad = jax.jit(jax.value_and_grad(loss_of))
        # fold the per-iteration perturbation INSIDE the jit (a host-side
        # tree_map would pay one relay dispatch per parameter leaf)
        tx_upd = jax.jit(lambda g, o, p, i: tx.update(
            jax.tree_util.tree_map(lambda x: x + i * 1e-9, g), o, p))

        def _mk_batch(i):
            b = dict(batch)
            b["roi_img"] = imgs[i % len(imgs)] + (i * 1e-6)
            return b

        # split the train-mode forward: model body alone (BN batch-stats
        # + dropout, no losses) vs model in eval mode vs full fwd+loss —
        # attributes the train-vs-eval forward MFU gap to BN/dropout vs
        # the dense-loss tail
        def model_only(params, b, train):
            if train:
                out, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    b, train=True, mutable=["batch_stats"])
            else:
                out = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    b, train=False)
            return out["rot_ego"]

        m_train = jax.jit(lambda p, b: model_only(p, b, True))
        m_eval = jax.jit(lambda p, b: model_only(p, b, False))
        time_fn(lambda i: m_eval(state.params, _mk_batch(i)),
                "model_fwd_eval")
        time_fn(lambda i: m_train(state.params, _mk_batch(i)),
                "model_fwd_train")
        time_fn(lambda i: fwd(state.params, _mk_batch(i)), "fwd_only")
        time_fn(lambda i: grad(state.params, _mk_batch(i))[1], "fwd_bwd")
        g0 = grad(state.params, _mk_batch(0))[1]
        time_fn(lambda i: tx_upd(g0, state.opt_state, state.params,
                                 jnp.float32(i))[0], "optimizer_only")




def _grouped_ab(cfg, args, peak):
    """Two-program grouped pipeline vs fused single program (see
    parallel.make_fused_sharded_train_step): same raw (frames, rois),
    same key stream. The two-program timing INCLUDES the preprocess
    dispatch the plain bench excludes — that is the production cost the
    fused path removes."""
    import jax
    import jax.numpy as jnp

    from rdpn6d_tpu.data.pipeline import preprocess_rois_grouped
    from rdpn6d_tpu.data.synthetic import dummy_grouped_inputs
    from rdpn6d_tpu.models import RDPN
    from rdpn6d_tpu.parallel import (create_mesh, create_train_state,
                                     make_fused_sharded_train_step,
                                     make_sharded_train_step, replicate,
                                     shard_batch)
    from rdpn6d_tpu.solver import build_optimizer

    import time

    mesh = create_mesh(1)
    model = RDPN(cfg, dtype=jnp.bfloat16)
    rpf = 5
    for bs in args.batch_sizes:
        n_frames = max(bs // rpf, 1)
        frames, rois = dummy_grouped_inputs(
            cfg, n_frames=n_frames, rois_per_frame=rpf,
            im_hw=(480, 640))
        n_rois = int(rois["frame_idx"].shape[0])
        key = jax.random.PRNGKey(3)
        batch0 = preprocess_rois_grouped(cfg, frames, rois, key,
                                         train=True)
        variables = jax.jit(lambda k, b: model.init(k, b, train=False))(
            jax.random.PRNGKey(0), batch0)
        tx = build_optimizer(cfg, total_iters=1000)
        step_fn = make_sharded_train_step(cfg, model, tx, mesh)
        fused_fn = make_fused_sharded_train_step(cfg, model, tx, mesh)
        pre_jit = jax.jit(
            lambda f, r, k: preprocess_rois_grouped(cfg, f, r, k,
                                                    train=True))

        def keyed(i):
            return jax.random.fold_in(key, i)

        def run_two(state, i):
            b = pre_jit(frames, rois, keyed(i))
            return step_fn(state, shard_batch(b, mesh))

        def run_fused(state, i):
            return fused_fn(state, frames, rois, keyed(i))

        try:
            flops = fused_fn.lower(
                replicate(create_train_state(cfg, variables, tx), mesh),
                frames, rois, key).compile().cost_analysis()["flops"]
        except Exception:
            flops = 0.0

        for tag, runner in (("two_program", run_two), ("fused", run_fused)):
            vb = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), variables)
            state = replicate(create_train_state(cfg, vb, tx), mesh)
            for i in range(args.warmup):
                state, metrics = runner(state, i)
                float(metrics["total_loss"])
            t0 = time.perf_counter()
            for i in range(args.iters):
                state, metrics = runner(state, i + 7)
                float(metrics["total_loss"])
            dt = (time.perf_counter() - t0) / args.iters
            import json as _json
            print(_json.dumps({
                "metric": f"grouped_ab/{tag} (raw frames -> fwd+bwd+opt)",
                "rois": n_rois, "frames": n_frames,
                "ms_per_step": round(dt * 1000, 1),
                "poses_per_sec": round(n_rois / dt, 1),
                "mfu_pct": round(100 * flops / dt / peak, 1)
                           if flops else None,
            }), flush=True)
if __name__ == "__main__":
    main()
