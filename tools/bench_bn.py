#!/usr/bin/env python
"""Attribute the train-vs-eval forward MFU gap per module (trunk / head).

PERF.md's sync decomposition put the bs=192 train-mode forward at 51% MFU
vs 74% eval-mode; the named suspect is BatchNorm batch-stat reductions
(dropout is off in every shipped config). This microbench times the two
flagship BN-bearing modules standalone, train vs eval mode, so the gap is
localized before any fix is attempted:

  * ResNetTrunk (33 BN layers over 256^2 -> 8^2 activations)
  * DenseHead   (7 BN layers over 64^2 x 256 — the FLOPs-dominant body)

Relay-safe methodology (distinct inputs per iteration + per-iteration
value readback), matching tools/bench_train.py.

Usage: python tools/bench_bn.py [--batch 192] [--iters 12]
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
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--s2d", action="store_true",
                   help="also bench the space-to-depth stem variants "
                        "(backbone.space_to_depth A/B, VERDICT r4 #4)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RDPN6D_CACHE_DIR", "/tmp/jax_cache"))

    from rdpn6d_tpu.models.heads import DenseHead
    from rdpn6d_tpu.models.resnet import ResNetTrunk

    bs = args.batch
    peak = 197e12

    def bench(name, module, in_shape, **kw):
        rng = np.random.RandomState(0)
        xs = [jnp.asarray(rng.rand(bs, *in_shape).astype(np.float32),
                          dtype=jnp.bfloat16) for _ in range(3)]
        # jitted init: eager flax init at bench batch sizes dispatches
        # hundreds of per-primitive compiles through the device relay
        variables = jax.jit(
            lambda k, x: module.init(k, x, train=False))(
            jax.random.PRNGKey(0), xs[0])

        def fwd_eval(v, x):
            return module.apply(v, x, train=False, **kw)

        def fwd_train(v, x):
            out, _ = module.apply(v, x, train=True,
                                  mutable=["batch_stats"], **kw)
            return out

        for tag, fn in (("eval", jax.jit(fwd_eval)),
                        ("train", jax.jit(fwd_train))):
            try:
                flops = fn.lower(variables, xs[0]).compile(
                    ).cost_analysis()["flops"]
            except Exception:
                flops = 0.0
            for i in range(args.warmup):
                r = fn(variables, xs[i % 3] + i * 1e-6)
                float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                              .astype(jnp.float32)))
            t0 = time.perf_counter()
            for i in range(args.iters):
                r = fn(variables, xs[i % 3] + (i + 7) * 1e-6)
                float(jnp.sum(jax.tree_util.tree_leaves(r)[0]
                              .astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / args.iters
            print(json.dumps({
                "module": name, "mode": tag, "batch": bs,
                "ms": round(dt * 1000, 2),
                "mfu_pct": round(100 * flops / dt / peak, 1)
                           if flops else None,
            }), flush=True)

    # 6 channels like the real model (rgb + depth-xyz): the HLO-level
    # suspect is the thin-channel input relayout copy, which depends on
    # the channel count
    bench("trunk_r34_256px", ResNetTrunk(depth=34, dtype=jnp.bfloat16),
          (256, 256, 6))
    if args.s2d:
        # the space-to-depth stem rewrite (backbone.space_to_depth):
        # identical math, packed input — the measured thin-stem remedy
        # candidate (PERF.md round 4 finding #2)
        bench("trunk_r34_256px_s2d",
              ResNetTrunk(depth=34, dtype=jnp.bfloat16, s2d_stem=True),
              (256, 256, 6))
        # 3-channel variants: the REAL trunk consumes only the RGB half
        # (rdpn.py:85), so this pair is the production-relevant A/B
        bench("trunk_r34_256px_rgb",
              ResNetTrunk(depth=34, dtype=jnp.bfloat16), (256, 256, 3))
        bench("trunk_r34_256px_rgb_s2d",
              ResNetTrunk(depth=34, dtype=jnp.bfloat16, s2d_stem=True),
              (256, 256, 3))
    # flagship head: 32^2x1024 fused pointnet input (rdpn.py:93),
    # 3 layers x 2 convs @ 64^2 x 256
    bench("dense_head_64px",
          DenseHead(mask_dim=1, coord_dim=3, region_dim=33,
                    num_filters=256, num_layers=3, norm="BN",
                    dtype=jnp.bfloat16, init_mode="fan_in"),
          (32, 32, 1024))


if __name__ == "__main__":
    main()
