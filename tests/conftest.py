"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via
``--xla_force_host_platform_device_count`` (the reference has no equivalent —
its distributed paths are only testable by launching real DDP, SURVEY.md §4).
"""

import os

# Force-override: the environment pins JAX_PLATFORMS to the single-chip TPU
# tunnel; tests must run on the virtual 8-device CPU mesh. The sitecustomize
# hook may have imported jax already (making env vars moot), so ALSO set the
# platform via jax.config — that works until the first backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: model-graph compiles dominate test wall-clock
# on this 1-core host; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Numerical tests verify geometry to ~1e-5; keep matmuls in full f32 here
# (the model path opts into bf16 explicitly via its own dtype policy).
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (multi-process)")
