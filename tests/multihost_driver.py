"""Subprocess driver for the 2-process multi-host CPU test.

Usage: python multihost_driver.py RANK NPROC COORD DATA_ROOT CFG_PATH

Brings up jax.distributed via the REAL CLI entry (``--multihost`` +
coordinator args, the counterpart of the reference's
--num-machines/--machine-rank/--dist-url, default_args_setup.py:52-64),
trains over the global mesh, then exercises the DCN prediction gather and
rank-0 write discipline. Prints MULTIHOST_OK <rank> on success.
"""

import os
import sys


def run() -> None:
    rank, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, data_root, cfg_path = sys.argv[3], sys.argv[4], sys.argv[5]

    # must precede any backend use; sitecustomize may have pinned the
    # platform env at interpreter startup, but jax.config still wins
    # before first backend init (see __graft_entry__._dryrun_multichip_impl)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import re
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")

    import rdpn6d_tpu.data.refs as refs_mod
    refs_mod.DATA_ROOT = data_root

    from rdpn6d_tpu.main import main

    main(["--config-file", cfg_path, "--multihost",
          "--dist-coordinator", coord,
          "--num-processes", str(nproc), "--process-id", str(rank)])

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    # DCN python-object prediction gather (reference comm.all_gather,
    # gdrn_evaluator.py:437-447) — different payload sizes per host to
    # exercise the padding
    from rdpn6d_tpu.parallel import gather_predictions
    local = [f"host{rank}"] * (rank + 1)
    merged = gather_predictions(local)
    assert sorted(merged) == ["host0", "host1", "host1"], merged

    print(f"MULTIHOST_OK {rank}", flush=True)


if __name__ == "__main__":
    run()
