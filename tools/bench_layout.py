#!/usr/bin/env python
"""Measure the input-relayout tax on the trunk forward and test AUTO layout.

HLO finding (round 4): the compiled trunk forward starts with a
``copy`` kernel that re-tiles the 6-channel NHWC input into the
batch-minor layout ``{0,3,2,1}`` XLA wants for the thin-channel stem
conv — ~22% of the trunk-forward estimated cycles at bs=16, paid in
BOTH train and eval mode. If real, the fix is to carry the AUTO layout
across the preprocess->model jit boundary (jax.experimental
Format/DLL.AUTO) so the producer writes the layout the consumer wants.

This microbench times the jitted trunk forward on the real chip:
  a. default layouts (the copy included),
  b. in_shardings=Format(DLL.AUTO) for the image input — XLA picks the
     input layout, the copy should vanish; input arrays are produced
     once via jax.device_put with the chosen format (staging cost
     excluded, as in production where the preprocess jit would emit it).

Usage: python tools/bench_layout.py [--batch 64] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RDPN6D_CACHE_DIR", "/tmp/jax_cache"))
    from rdpn6d_tpu.models.resnet import ResNetTrunk

    bs = args.batch
    m = ResNetTrunk(depth=34, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    xs_np = [rng.rand(bs, 256, 256, 6).astype(np.float32)
             for _ in range(3)]
    x0 = jnp.asarray(xs_np[0], jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x0, train=False)

    def fwd(v, x):
        return m.apply(v, x, train=False)

    def timeit(fn, xs):
        for i in range(args.warmup):
            jax.block_until_ready(fn(v, xs[i % len(xs)]))
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(v, xs[i % len(xs)])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    # a) default layouts
    jit_def = jax.jit(fwd)
    xs = [jnp.asarray(a, jnp.bfloat16) for a in xs_np]
    ms_def = timeit(jit_def, xs)
    print(f"default layout : {ms_def:7.2f} ms/fwd  bs={bs}")

    # b) AUTO input layout (skip gracefully if the API shape moved)
    try:
        from jax.experimental.layout import Format, Layout  # type: ignore
        auto = Format(Layout.AUTO)
    except Exception:
        try:  # older spelling
            from jax.experimental.layout import (  # type: ignore
                DeviceLocalLayout as DLL, Format)
            auto = Format(DLL.AUTO)
        except Exception as e:
            print(f"AUTO layout API unavailable ({e}); stopping after (a)")
            return
    try:
        jit_auto = jax.jit(fwd, in_shardings=(None, auto))
        lowered = jit_auto.lower(v, x0)
        compiled = lowered.compile()
        fmt = compiled.input_formats[0][1]
        xs_fmt = [jax.device_put(a.astype(jnp.bfloat16), fmt)
                  for a in xs_np]
        ms_auto = timeit(compiled, xs_fmt)
        print(f"AUTO in-layout : {ms_auto:7.2f} ms/fwd  "
              f"({(ms_def - ms_auto) / ms_def * 100:+.1f}% vs default; "
              f"chosen={fmt})")
    except Exception as e:
        print(f"AUTO layout path failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
