#!/usr/bin/env python
"""Convert a released reference (torch) RDPN/GDRN checkpoint to flax params.

The conversion is numerically exact (tests/test_checkpoint_parity.py):
spatial pointnet, dense head (incl. the ConvTranspose convention), Patch-PnP
(incl. the NCHW->NHWC flatten permutation) and the ResNet trunk.

Usage:
  python tools/convert_checkpoint.py --pth model.pth --out model_flax.pkl
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--depth", type=int, default=34)
    args = p.parse_args()

    import torch

    from rdpn6d_tpu.utils.torch_convert import convert_rdpn_checkpoint

    sd = torch.load(args.pth, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params, stats = convert_rdpn_checkpoint(sd, depth=args.depth)
    with open(args.out, "wb") as f:
        pickle.dump({"params": params, "batch_stats": stats}, f)
    n = sum(x.size for x in _leaves(params))
    print(f"converted {n / 1e6:.1f}M params -> {args.out}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
