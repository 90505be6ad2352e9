#!/usr/bin/env python
"""Sweep a single-object (SO) family: train (and optionally eval) one
model per object of a dataset via configs/so.py variants.

The reference ships one config FILE per object (configs/gdrn/*SO/) and
users launch them one by one; this drives the whole family:

    python tools/train_so_family.py --dataset mp6d
    python tools/train_so_family.py --dataset tudl --objs dragon can \\
        --eval-only --opts solver.ims_per_batch=48

Each object runs in-process sequentially (one TPU mesh, compile cache
shared across objects since shapes are identical).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   help="SO family: lm | lmo | ycbv | mp6d | tless | "
                        "tudl | itodd | icbin | hb")
    p.add_argument("--objs", nargs="*", default=None,
                   help="subset of object names (default: all)")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--opts", nargs="*", default=[])
    args = p.parse_args()

    from rdpn6d_tpu.data.refs import get_ref
    from rdpn6d_tpu.main import main as run_main

    ref = get_ref(args.dataset)
    objs = args.objs or ([o for o in ref.objects
                          if o not in ("bowl", "cup")]
                         if args.dataset == "lm" else list(ref.objects))
    logging.basicConfig(level=logging.INFO)
    failures = []
    for i, obj in enumerate(objs):
        print(f"=== [{i + 1}/{len(objs)}] {args.dataset}SO/{obj} ===",
              flush=True)
        so_cfg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "..", "configs", "so.py")
        argv = ["--config-file",
                f"{os.path.normpath(so_cfg)}:{args.dataset}/{obj}"]
        if args.eval_only:
            argv.append("--eval-only")
        if args.resume:
            argv.append("--resume")
        if args.opts:
            argv += ["--opts", *args.opts]
        try:
            run_main(argv)
        except Exception as e:  # keep sweeping; report at the end
            logging.exception(f"{obj} failed")
            failures.append((obj, repr(e)))
    if failures:
        print("FAILED objects:")
        for obj, err in failures:
            print(f"  {obj}: {err}")
        sys.exit(1)
    print(f"all {len(objs)} objects completed")


if __name__ == "__main__":
    main()
