"""End-to-end throughput benchmark: RGB-D ROI batch -> 6DoF poses, on-device.

Measures poses/sec/chip through the full jitted inference path (backbone +
fusion + dense head + Patch-PnP + on-device pose recovery) at the flagship
configuration (ResNet-34, 256x256x6 input, 64x64 heads, 32 regions — the
YCB-V/LM production shape).

Baseline: the reference publishes no throughput numbers (BASELINE.md); its
inference loop logs wall-clock per image on an unspecified CUDA GPU. We take
100 poses/sec as the reference point — GDR-Net-family single-ROI GPU
inference is ~25-40 ms/pose plus per-ROI host preprocessing (cv2 warps,
numpy allo/ego at test: gdrn_evaluator.py:603-683), which lands a DDP-free
GPU pipeline in the tens of poses/sec. vs_baseline = value / 100.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from rdpn6d_tpu.config import Config
from rdpn6d_tpu.models import RDPN, dummy_batch

BASELINE_POSES_PER_SEC = 100.0


def _measure(model, variables, batch_size: int, cfg,
             n_iters: int = 10) -> float:
    # distinct inputs per iteration + a scalar host readback per iteration:
    # guards against any execution caching/async shortcut in the device
    # relay that would otherwise fake the timing
    key = jax.random.PRNGKey(0)
    batches = []
    for i in range(4):
        b = dict(dummy_batch(cfg, batch_size))
        b["roi_img"] = jax.random.normal(
            jax.random.fold_in(key, i),
            (batch_size, cfg.backbone.input_res, cfg.backbone.input_res, 6),
            jnp.float32)
        batches.append(b)

    @jax.jit
    def forward(variables, batch):
        out = model.apply(variables, batch, train=False)
        return out["rot_ego"], out["trans"], jnp.sum(out["trans"])

    for i in range(2):  # warmup / compile
        jax.block_until_ready(forward(variables, batches[i % 4]))

    start = time.perf_counter()
    sink = 0.0
    for i in range(n_iters):
        r, t, s = forward(variables, batches[i % 4])
        sink += float(s)  # forces device round-trip
    elapsed = time.perf_counter() - start
    assert sink == sink, "NaN sink"
    return batch_size * n_iters / elapsed


def main() -> None:
    cfg = Config()
    model = RDPN(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), dummy_batch(cfg, 2),
                           train=False)

    best_bs, best = 0, 0.0
    for bs in (64, 128, 256):
        pps = _measure(model, variables, bs, cfg)
        if pps > best:
            best_bs, best = bs, pps

    print(json.dumps({
        "metric": "poses/sec/chip end-to-end RGB-D->6DoF "
                  f"(ResNet34 256px, best bs={best_bs})",
        "value": round(best, 2),
        "unit": "poses/sec",
        "vs_baseline": round(best / BASELINE_POSES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
