#!/usr/bin/env python
"""Strip optimizer state from a checkpoint for release.

Counterpart of the reference's ``tools/remove_optim_from_ckpt.py:18-41``:
load an orbax checkpoint, drop opt_state, re-save with a content-hash
suffix so distributed caches can verify integrity.

Usage: python tools/strip_checkpoint.py --ckpt-dir output/ckpt --out release/
"""

from __future__ import annotations

import argparse
import hashlib
import os
import pickle

import numpy as np
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--step", type=int, default=-1)
    args = p.parse_args()

    import jax
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(args.ckpt_dir))
    step = args.step if args.step >= 0 else mgr.latest_step()
    assert step is not None, "no checkpoint found"
    restored = mgr.restore(step)
    state = restored["state"]
    slim = {"params": state["params"],
            "batch_stats": state.get("batch_stats", {}),
            "step": step}

    # materialize leaves as plain numpy: a release pickle must not
    # require jax (or allocate on a device) to unpickle
    blob = pickle.dumps(jax.tree_util.tree_map(np.asarray, slim))
    sha = hashlib.sha256(blob).hexdigest()[:8]
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, f"model_{step}_{sha}.pkl")
    with open(out_path, "wb") as f:
        f.write(blob)
    print(f"wrote {out_path} ({len(blob) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
