#!/usr/bin/env python
"""Fuse multiple detection json files into one, keeping best-score per
(scene, image, object).

Counterpart of the reference's per-dataset detection fusion scripts
(tools/lmo/1_gen_det_lm_real_all_fuse.py).

Usage: python tools/fuse_detections.py --out fused.json a.json b.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+")
    p.add_argument("--out", required=True)
    p.add_argument("--keep", type=int, default=1,
                   help="detections kept per (scene,im,obj)")
    args = p.parse_args()

    from rdpn6d_tpu.data.detections import load_detections

    best: dict[tuple, list[dict]] = {}
    for path in args.inputs:
        for (scene, im), dets in load_detections(path).items():
            for d in dets:
                key = (scene, im, d["obj_id"])
                best.setdefault(key, []).append(d)

    out = []
    for (scene, im, obj), dets in sorted(best.items()):
        for d in sorted(dets, key=lambda x: -x["score"])[:args.keep]:
            x1, y1, x2, y2 = [float(v) for v in d["bbox"]]
            out.append({"scene_id": scene, "im_id": im, "obj_id": obj,
                        "bbox_est": [x1, y1, x2 - x1, y2 - y1],
                        "score": d["score"], "time": d["time"]})
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(out)} detections to {args.out}")


if __name__ == "__main__":
    main()
