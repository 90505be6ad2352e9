#!/usr/bin/env python
"""int8 serving-mode e2e timing: bf16 vs dynamic vs static-calibrated.

Times the full eval forward at serving batch size with the relay-safe
methodology (distinct inputs, per-iteration value readback). The round-2
finding was dynamic int8 NET-SLOWER than bf16 (per-conv absmax reductions
block fusion); static calibrated scales remove the reductions — this
measures whether that flips the sign.

Usage: python tools/bench_int8.py [--batch 256] [--iters 10]
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
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--modes", nargs="*",
                   default=["bf16", "head", "head-static", "all",
                            "all-static"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from rdpn6d_tpu.config import Config
    from rdpn6d_tpu.models import RDPN, dummy_batch
    from rdpn6d_tpu.models.quant import calibrate_quant
    from rdpn6d_tpu.parallel import make_eval_step

    cfg = Config()
    bs = args.batch
    batch = dummy_batch(cfg, bs)
    rng = np.random.RandomState(0)
    batch["roi_img"] = jnp.asarray(
        rng.rand(*batch["roi_img"].shape).astype(np.float32))
    imgs = [jnp.asarray(rng.rand(*batch["roi_img"].shape)
                        .astype(np.float32)) for _ in range(4)]

    from rdpn6d_tpu.parallel import create_train_state
    from rdpn6d_tpu.solver import build_optimizer

    bf16 = RDPN(cfg, dtype=jnp.bfloat16)
    variables = bf16.init(jax.random.PRNGKey(0), batch, train=False)
    S = create_train_state(cfg, variables,
                           build_optimizer(cfg, total_iters=1))

    results = {}
    for mode in args.modes:
        if mode == "bf16":
            model, quant = bf16, None
        elif mode.endswith("-static"):
            gran = mode[:-len("-static")]
            model = RDPN(cfg, dtype=jnp.bfloat16, int8=gran,
                         int8_static=True)
            quant = calibrate_quant(model, S.params, S.batch_stats,
                                    [batch])
        else:
            model, quant = RDPN(cfg, dtype=jnp.bfloat16, int8=mode), None
        step = make_eval_step(cfg, model, use_kabsch=False, quant=quant)

        def run(i):
            b = dict(batch)
            b["roi_img"] = imgs[i % len(imgs)] + (i * 1e-6)
            return step(S, b)

        for i in range(args.warmup):
            out = run(i)
            float(jnp.sum(out["trans"]))
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = run(i + 7)
            float(jnp.sum(out["trans"]))
        dt = (time.perf_counter() - t0) / args.iters
        results[mode] = dt
        print(json.dumps({
            "mode": mode, "batch": bs,
            "ms_per_batch": round(dt * 1000, 1),
            "poses_per_sec": round(bs / dt, 1),
            "vs_bf16": round(results.get("bf16", dt) / dt, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
