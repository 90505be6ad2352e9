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
import os
import subprocess
import sys
import time

# fail FAST if the device backend is unreachable (a wedged TPU tunnel makes
# jax.devices() hang indefinitely): probe it in a bounded subprocess before
# importing anything heavy, so a dead relay yields a clear error instead of
# an hours-long hang (and never a fake benchmark line)
if os.environ.get("RDPN6D_BENCH_PROBED") != "1":
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            env={**os.environ, "RDPN6D_BENCH_PROBED": "1"},
            timeout=180, check=True, capture_output=True)
    except subprocess.TimeoutExpired:
        sys.stderr.write(
            "bench.py: device backend unreachable (jax.devices() did not "
            "return within 180s — TPU relay down?); refusing to hang\n")
        sys.exit(2)
    except subprocess.CalledProcessError as e:
        sys.stderr.write(
            "bench.py: device backend failed to initialize:\n"
            + e.stderr.decode(errors="replace")[-2000:] + "\n")
        sys.exit(2)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from rdpn6d_tpu.config import Config
from rdpn6d_tpu.data.pipeline import preprocess_batch
from rdpn6d_tpu.models import RDPN, dummy_batch

BASELINE_POSES_PER_SEC = 100.0


def _frame_batches(cfg, batch_size: int, n: int = 4):
    """Distinct random FULL-FRAME inputs (480x640 RGB-D + boxes)."""
    key = jax.random.PRNGKey(0)
    out = []
    for i in range(n):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
        b = batch_size
        cx = jax.random.uniform(k3, (b,), minval=200.0, maxval=440.0)
        cy = jax.random.uniform(k3, (b,), minval=150.0, maxval=330.0)
        side = jnp.full((b,), 96.0)
        out.append({
            "rgb": jax.random.uniform(k1, (b, 480, 640, 3)) * 255.0,
            "depth": jax.random.uniform(k2, (b, 480, 640),
                                        minval=0.4, maxval=1.2),
            "K": jnp.tile(jnp.asarray([[572.4, 0, 325.3],
                                       [0, 573.6, 242.0],
                                       [0, 0, 1.0]], jnp.float32),
                          (b, 1, 1)),
            "bbox": jnp.stack([cx - side, cy - side, cx + side, cy + side],
                              -1),
            "fps": jax.random.normal(k1, (b, cfg.head.num_regions, 3))
            * 0.05,
            "extent": jnp.full((b, 3), 0.1),
        })
    return out


def _measure(model, variables, batch_size: int, cfg,
             n_iters: int = 16) -> tuple[float, float]:
    """TRUE end-to-end: full RGB-D frames -> on-device preprocessing
    (DZI crop, depth backprojection, coord features) -> CNN -> poses.

    Iterations are PIPELINED (async dispatch, one block at the end): the
    device relay in this environment adds ~25 ms latency to every
    synchronous round-trip, which is pure host-visible latency, not chip
    time — production streams batches exactly like this. Distinct inputs
    per iteration guard against execution caching in the relay; every
    output participates in the final readback.

    Returns (poses/sec, model FLOPs per pose from XLA cost analysis).
    """
    # staged full frames are ~5 MB/pose; cap resident batches so the
    # largest sweep point fits alongside the working set
    frames = _frame_batches(cfg, batch_size, n=min(8, max(4, 2048 // batch_size)))
    key = jax.random.PRNGKey(1)

    @jax.jit
    def end_to_end(variables, frames):
        batch = preprocess_batch(cfg, frames, key, train=False)
        batch["roi_cls"] = jnp.zeros((batch_size,), jnp.int32)
        out = model.apply(variables, batch, train=False)
        return out["rot_ego"], out["trans"], jnp.sum(out["trans"])

    for i in range(3):  # warmup / compile
        jax.block_until_ready(end_to_end(variables, frames[i % len(frames)]))

    start = time.perf_counter()
    sinks = []
    for i in range(n_iters):
        _, _, s = end_to_end(variables, frames[i % len(frames)])
        sinks.append(s)
    sink = float(sum(jax.block_until_ready(sinks)))
    elapsed = time.perf_counter() - start
    assert sink == sink, "NaN sink"

    ca = end_to_end.lower(variables, frames[0]).compile().cost_analysis()
    flops = (ca if isinstance(ca, dict) else ca[0]).get("flops", 0.0)
    return batch_size * n_iters / elapsed, flops / batch_size


def main() -> None:
    cfg = Config()
    model = RDPN(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), dummy_batch(cfg, 2),
                           train=False)

    best_bs, best_bf16, best_fpp = 0, 0.0, 0.0
    # DESCENDING sweep with early exit: bs=384 has been the winner on
    # every round of record (BENCH_r02-r04), and each sweep point is a
    # full flagship compile — ~10-20 min through a remote-compile relay.
    # Once a smaller batch measures slower than the best so far, the
    # curve is past its knee and the remaining points can't win.
    for bs in (384, 256, 128):
        try:
            pps, fpp = _measure(model, variables, bs, cfg)
        except Exception as e:
            # tolerate ONLY an OOM at the largest point (continue down
            # the sweep); a failure with nothing measured must surface,
            # not print value 0.0 with exit 0
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            continue
        if pps > best_bf16:
            best_bs, best_bf16, best_fpp = bs, pps, fpp
        elif best_bf16 > 0.0:
            break  # throughput declining as bs shrinks — stop compiling
    if best_bf16 == 0.0:
        raise RuntimeError("every sweep point OOMed")

    # int8-head-static serving mode: calibrated scalar requant scales,
    # measured 1.16x faster than bf16 e2e; accuracy gate holds ad_10/
    # te_2/AUCad parity with bf16 (re_5 scoped per PERF.md round 3/4).
    # The headline takes whichever mode is faster; the int8 portion runs
    # against a 394 TOPS int8 peak, so its speedup is reported as
    # `int8_speedup` over bf16 — NOT folded into an "MFU". mfu_bf16_pct
    # is the honest hardware-utilization figure: bf16 mode throughput x
    # analytic FLOPs/pose / the 197 TFLOP/s bf16 peak.
    mode, best = "bf16", best_bf16
    int8_speedup = None  # probe crashed / not run
    try:
        from rdpn6d_tpu.models.quant import calibrate_quant

        m_q = RDPN(cfg, dtype=jnp.bfloat16, int8="head", int8_static=True)
        cal_frames = _frame_batches(cfg, best_bs, n=1)[0]
        pre = preprocess_batch(cfg, cal_frames, jax.random.PRNGKey(1),
                               train=False)
        pre["roi_cls"] = jnp.zeros((best_bs,), jnp.int32)
        quant = calibrate_quant(m_q, variables["params"],
                                variables.get("batch_stats", {}), [pre])
        pps_q, _ = _measure(m_q, {**variables, "quant": quant},
                            best_bs, cfg)
        # always reported when measured — a <1.0 value means "int8
        # measured slower" (headline stays bf16), DISTINCT from null =
        # "probe crashed"
        int8_speedup = round(pps_q / best_bf16, 3)
        if pps_q > best:
            best, mode = pps_q, "int8-head-static"
    except Exception:
        pass  # serving-mode probe must never break the benchmark

    # TPU v5e ("TPU v5 lite") peak: 197 TFLOP/s bf16 (394 is the int8
    # figure). Microbench check: a chained 3x3x256@64^2 conv+bn+relu stack
    # sustains 87% of 197 TFLOP/s on this chip, so 197 is the right
    # denominator for the bf16 utilization figure.
    peak = 197e12
    mfu_bf16 = best_bf16 * best_fpp / peak

    print(json.dumps({
        # "FULL-frame ... on-device preprocessing" = DZI crop + depth
        # backprojection + coord features run on-chip inside the timed
        # jit; frames are PRE-STAGED as device arrays, so host decode +
        # host->device transfer are excluded (measured separately by
        # tools/bench_input.py).
        "metric": "poses/sec/chip FULL-frame RGB-D->6DoF incl. on-device "
                  f"preprocessing (ResNet34 256px, best bs={best_bs}, "
                  f"{mode}; frames pre-staged on device)",
        "value": round(best, 2),
        "unit": "poses/sec",
        "vs_baseline": round(best / BASELINE_POSES_PER_SEC, 3),
        "gflop_per_pose": round(best_fpp / 1e9, 2),
        "bf16_poses_per_sec": round(best_bf16, 2),
        "mfu_bf16_pct": round(mfu_bf16 * 100.0, 2),
        "int8_speedup": int8_speedup,
    }))


if __name__ == "__main__":
    main()
