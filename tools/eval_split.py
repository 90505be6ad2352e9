#!/usr/bin/env python
"""Evaluate a checkpoint on a test split: the scripted test_gdrn.sh path.

Counterpart of the reference's eval flow (test_gdrn.sh -> main_gdrn.py
--eval-only -> do_test -> gdrn_inference_on_dataset -> evaluator). Thin CLI
over ``rdpn6d_tpu.engine.eval_runner.run_eval``.

Usage:
  python tools/eval_split.py --config-file configs/lm13.py \
      --ckpt-dir output/lm13/ckpt --split lm_13_test \
      [--dets path/to/detections.json]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--split", required=True)
    p.add_argument("--dets", default="",
                   help="external detections json (est-bbox eval)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--csv", default="")
    p.add_argument("--json", default="",
                   help="write the metric dict to this json file "
                        "(machine-readable gate for rehearsal/CI)")
    p.add_argument("--opts", nargs="*", default=[])
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)
    from rdpn6d_tpu.config import load_config
    from rdpn6d_tpu.engine.eval_runner import run_eval

    cfg = load_config(args.config_file, args.opts)
    result = run_eval(cfg, args.ckpt_dir, args.split, dets_path=args.dets,
                      batch_size=args.batch_size,
                      csv_path=args.csv or None)
    if args.json:
        import json

        def _plain(x):
            if isinstance(x, dict):
                return {k: _plain(v) for k, v in x.items()}
            try:
                return float(x)
            except (TypeError, ValueError):
                return str(x)

        with open(args.json, "w") as f:
            json.dump(_plain(result), f, indent=2)
    return result


if __name__ == "__main__":
    main()
