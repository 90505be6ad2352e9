#!/usr/bin/env python
"""Training INPUT-path benchmark: flat per-ROI vs frame-deduplicated.

Measures the host decode -> transfer -> on-device preprocess pipeline in
isolation (the binding constraint on real training per PERF.md: the chip
sustains ~4x more poses/s than one decode core feeds). Runs both loaders
over the same on-disk multi-instance dataset and reports poses/s plus
host->device bytes per pose.

Usage (after tools/make_mini_bop.py --out ROOT):
  RDPN6D_DATA_ROOT=ROOT python tools/bench_input.py [--batch 192]
      [--iters 8] [--split lm_mini_train]
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
    p.add_argument("--batch", type=int, default=192)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--split", default="lm_mini_train")
    p.add_argument("--modes", nargs="*", default=["flat", "grouped"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from rdpn6d_tpu.config import Config
    from rdpn6d_tpu.data.loader import (train_frame_iterator,
                                        train_group_iterator)
    from rdpn6d_tpu.data.pipeline import (preprocess_batch,
                                          preprocess_rois_grouped)

    cfg = Config()
    key = jax.random.PRNGKey(0)

    def nbytes(tree):
        return sum(np.asarray(v).nbytes for v in tree.values())

    for mode in args.modes:
        if mode == "flat":
            it = train_frame_iterator(cfg, args.split,
                                      batch_size=args.batch)

            def step(host_batch):
                dev = {k: jnp.asarray(v) for k, v in host_batch.items()}
                out = preprocess_batch(cfg, dev, key, train=True)
                return out["roi_img"], nbytes(host_batch)
        else:
            it = train_group_iterator(cfg, args.split,
                                      batch_size=args.batch)

            def step(host_batch):
                frames = {k: jnp.asarray(v)
                          for k, v in host_batch["frames"].items()}
                rois = {k: jnp.asarray(v)
                        for k, v in host_batch["rois"].items()}
                out = preprocess_rois_grouped(cfg, frames, rois, key,
                                              train=True)
                return out["roi_img"], (nbytes(host_batch["frames"])
                                        + nbytes(host_batch["rois"]))

        total_bytes = 0
        for _ in range(args.warmup):
            img, _ = step(next(it))
            float(jnp.sum(img))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            img, b = step(next(it))
            float(jnp.sum(img))  # value readback (relay-safe)
            total_bytes += b
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "metric": f"input-path poses/sec ({mode})",
            "batch": args.batch,
            "ms_per_batch": round(dt * 1000, 1),
            "value": round(args.batch / dt, 1),
            "unit": "poses/sec",
            "mb_per_pose": round(total_bytes / args.iters / args.batch
                                 / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
