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


def main() -> None:
    cfg = Config()
    batch_size = 64
    model = RDPN(cfg, dtype=jnp.bfloat16)
    batch = dummy_batch(cfg, batch_size)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    @jax.jit
    def forward(variables, batch):
        out = model.apply(variables, batch, train=False)
        return out["rot_ego"], out["trans"]

    # warmup / compile
    r, t = forward(variables, batch)
    jax.block_until_ready((r, t))

    n_iters = 20
    start = time.perf_counter()
    for _ in range(n_iters):
        r, t = forward(variables, batch)
    jax.block_until_ready((r, t))
    elapsed = time.perf_counter() - start

    poses_per_sec = batch_size * n_iters / elapsed
    print(json.dumps({
        "metric": "poses/sec/chip end-to-end RGB-D->6DoF (ResNet34 256px, bs64)",
        "value": round(poses_per_sec, 2),
        "unit": "poses/sec",
        "vs_baseline": round(poses_per_sec / BASELINE_POSES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
