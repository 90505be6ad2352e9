#!/usr/bin/env python
"""Attribute the REAL training CLI's per-iteration wall-clock (VERDICT r4 #5).

bench_train.py measures the compiled step on synthetic inputs; the CLI
runs slower (run E: 0.44-0.66 s/it; run F: ~0.34 s/it at bs=24 vs the
~60 ms bare step). This tool rebuilds main.py's exact production path —
grouped loader + device frame cache + preprocess program + sharded train
step — on a real dataset tree and times each stage SYNCHRONOUSLY, then
the whole loop PIPELINED (as the trainer runs it), so the gap decomposes
into: host produce / cache-stack+H2D / preprocess program / train step /
readback, plus the pipelining recovery.

Usage (needs a generated tree, e.g. tools/make_mini_bop.py):
  RDPN6D_DATA_ROOT=/tmp/mini_f python tools/bench_cli_step.py \
      --split lm_mini_train --batch 24 --iters 30 \
      --opts backbone.rot_concat=true data.device_frame_cache_mb=6144 \
             data.frame_cache_mb=12288
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
    p.add_argument("--split", default="lm_mini_train")
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warm-epoch", action="store_true", default=True,
                   help="run one full epoch of host batches first so the "
                        "host LRU + device cache measure warm (the "
                        "steady-state regime)")
    p.add_argument("--opts", nargs="*", default=[])
    args = p.parse_args()

    import importlib.util

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RDPN6D_CACHE_DIR", "/tmp/jax_cache"))

    spec = importlib.util.spec_from_file_location(
        "mini", os.path.join(os.path.dirname(__file__), "..",
                             "configs", "mini.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cfg = mod.get_config().apply_opts(
        [f'data.train_datasets=["{args.split}"]',
         f"solver.ims_per_batch={args.batch}",
         'train.output_dir="/tmp/bench_cli_step"', *args.opts])

    from rdpn6d_tpu.data.device_cache import DeviceFrameCache
    from rdpn6d_tpu.data.loader import load_train_records, train_group_iterator
    from rdpn6d_tpu.data.pipeline import preprocess_rois_grouped
    from rdpn6d_tpu.models import RDPN, dummy_batch
    from rdpn6d_tpu.parallel import (
        create_mesh,
        create_train_state,
        make_sharded_train_step,
        replicate,
        shard_batch,
    )
    from rdpn6d_tpu.solver import build_optimizer

    n_records = len(load_train_records(
        cfg, [args.split], cache_dir="/tmp/bench_cli_step/cache"))
    iters_per_epoch = max(n_records // args.batch, 1)
    print(f"{n_records} records, {iters_per_epoch} iters/epoch")

    model = RDPN(cfg, dtype=jnp.bfloat16 if cfg.solver.amp else jnp.float32)
    variables = jax.jit(lambda k: model.init(
        k, dummy_batch(cfg, 2), train=False))(jax.random.PRNGKey(0))
    mesh = create_mesh()
    tx = build_optimizer(cfg, 1000)
    state = replicate(create_train_state(cfg, variables, tx), mesh)
    step_fn = make_sharded_train_step(cfg, model, tx, mesh)

    dev_cache = DeviceFrameCache(cfg.data.device_frame_cache_mb << 20)
    it = train_group_iterator(cfg, [args.split], seed=0,
                              batch_size=args.batch,
                              cache_dir="/tmp/bench_cli_step/cache",
                              frame_bucket=cfg.data.frame_bucket,
                              yield_keys=True)
    key = jax.random.PRNGKey(0)

    def one_iter(sync: bool) -> dict[str, float] | None:
        nonlocal key, state
        t = {}
        t0 = time.perf_counter()
        gb = next(it)
        t["host_produce"] = time.perf_counter() - t0

        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        frames = dev_cache.stack(gb["frame_slots"])
        if sync:
            jax.block_until_ready(frames)
        t["cache_stack_h2d"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        rois = {k: jnp.asarray(v) for k, v in gb["rois"].items()}
        batch = preprocess_rois_grouped(cfg, frames, rois, sub, train=True)
        if sync:
            jax.block_until_ready(batch)
        t["preprocess"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        batch = shard_batch(batch, mesh)
        state, metrics = step_fn(state, batch)
        if sync:
            jax.block_until_ready(metrics)
        t["train_step"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        total = float(metrics["total_loss"])
        t["loss_readback"] = time.perf_counter() - t0
        if not np.isfinite(total):
            raise FloatingPointError("non-finite loss in bench")
        return t

    # warm: compiles + one epoch of host batches so every cache is hot
    one_iter(sync=True)
    if args.warm_epoch:
        t0 = time.perf_counter()
        for _ in range(iters_per_epoch):
            one_iter(sync=False)
        print(f"warm epoch: {time.perf_counter()-t0:.1f}s "
              f"({(time.perf_counter()-t0)/iters_per_epoch*1000:.0f} ms/it "
              "cold-ish, pipelined)")

    # synchronous decomposition
    acc: dict[str, list[float]] = {}
    for _ in range(args.iters):
        for k, v in one_iter(sync=True).items():
            acc.setdefault(k, []).append(v)
    sync_ms = {k: round(float(np.median(v)) * 1000, 1)
               for k, v in acc.items()}
    sync_total = round(sum(sync_ms.values()), 1)

    # pipelined (trainer-style: async dispatch, lag-1 readback)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        one_iter(sync=False)
    pipe_ms = round((time.perf_counter() - t0) / args.iters * 1000, 1)

    print(json.dumps({
        "batch": args.batch,
        "sync_ms": sync_ms,
        "sync_total_ms": sync_total,
        "pipelined_ms_per_iter": pipe_ms,
        "pipelining_recovery_ms": round(sync_total - pipe_ms, 1),
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
