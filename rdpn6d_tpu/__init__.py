"""rdpn6d_tpu — TPU-native (JAX/XLA/Pallas) dense point-wise 6DoF pose framework.

A from-scratch rebuild of the capabilities of RDPN6D
(AI-Application-and-Integration-Lab/RDPN6D, CVPRW DLGC 2024): RGB-D ROI crops
through a ResNet+PointNet-fusion backbone with dense coordinate-residual /
region / mask heads and a Patch-PnP head regressing allocentric rot6d +
centroid/z, with the full image->pose path (including preprocessing and pose
recovery) compiled on-device.

Layer map (bottom to top):
    geometry/    pure-JAX rotation/camera/SE3/symmetry math
    ops/         FPS, ROI warp, backprojection, region labels, RANSAC-Kabsch
    models/      flax.linen backbone + heads + top-level RDPN module
    losses/      masked coord/mask/region losses, point-matching loss
    data/        BOP dataset registry, records, on-device preprocessing graph
    solver/      optax Ranger + flat_and_anneal schedule
    parallel/    device-mesh sharding and SPMD train/eval steps
    engine/      trainer, checkpointing, metric writers
    evaluation/  ADD(-S)/AUC/re/te/proj scoring + BOP19 CSV export
    csrc/        native C++ components (FPS, software rasterizer)
"""

__version__ = "0.1.0"

# Platform override honored by every entry point (CLI, tools, tests):
# some environments pin JAX_PLATFORMS at interpreter startup via
# sitecustomize, where a plain env var set by a parent process loses.
# jax.config wins as long as no backend has been initialized, and this
# package is imported before any tool touches a backend.
import os as _os

if _os.environ.get("RDPN6D_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["RDPN6D_PLATFORM"])

# Persistent XLA compilation cache for every entry point (CLI, tools,
# tests): flagship-step compiles cost minutes through a device relay and
# 20-40 s even directly attached; the cache makes re-runs start in
# seconds. Opt out / redirect with RDPN6D_CACHE_DIR="" / =path.
_cache_dir = _os.environ.get("RDPN6D_CACHE_DIR", "/tmp/jax_cache")
if _cache_dir:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
