#!/usr/bin/env python
"""Generate GT NOCS-style xyz crops for a dataset split.

Counterpart of the reference's per-dataset ``tools/<ds>/*_gen_xyz_crop.py``
(tools/lm/lm_pbr_1_gen_xyz_crop.py:110-200): render each GT pose, crop the
model-coordinate map to its bbox, save float16 pkls
``xyz_crop/{im_id:06d}_{inst_idx:06d}.pkl`` with {xyz_crop, xyxy}. Uses the
native software rasterizer (csrc/rasterizer) — no OpenGL/EGL needed.

Usage: python tools/gen_xyz_crop.py --split lm_13_train
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rdpn6d_tpu.data.bop import build_split_records, get_split  # noqa: E402
from rdpn6d_tpu.data.inout import load_ply  # noqa: E402
from rdpn6d_tpu.data.refs import get_ref  # noqa: E402
from rdpn6d_tpu.ops.rasterizer import render_mesh  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--split", required=True)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--custom-root", default="",
                   help="NAME=PATH: register a custom BOP-layout dataset "
                        "(and its {NAME}_train/{NAME}_test splits) before "
                        "resolving --split (data/custom.py)")
    args = p.parse_args()

    if args.custom_root:
        from rdpn6d_tpu.data.custom import register_custom_dataset
        cname, sep, croot = args.custom_root.partition("=")
        if not (sep and cname and croot):
            raise SystemExit(
                f"--custom-root expects NAME=PATH, got {args.custom_root!r}")
        register_custom_dataset(cname, root=croot)
    split = get_split(args.split)
    ref = get_ref(split.ref_name)
    records = build_split_records(split, flatten=True)

    meshes = {}
    n_done = 0
    for rec in records:
        out_path = rec["xyz_path"]
        if os.path.exists(out_path) and not args.overwrite:
            continue
        oid = rec["obj_id"]
        if oid not in meshes:
            ply = load_ply(ref.model_path(oid),
                           vertex_scale=ref.vertex_scale)
            if "faces" not in ply:
                raise RuntimeError(f"model {oid} has no faces")
            meshes[oid] = (ply["pts"].astype(np.float32),
                           ply["faces"].astype(np.int32))
        verts, faces = meshes[oid]
        depth, xyz = render_mesh(verts, faces, rec["K"], rec["R"], rec["t"],
                                 rec["height"], rec["width"])
        mask = depth > 0
        if not mask.any():
            continue
        ys, xs = np.nonzero(mask)
        x1, y1, x2, y2 = xs.min(), ys.min(), xs.max(), ys.max()
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "wb") as f:
            pickle.dump({
                "xyz_crop": xyz[y1:y2 + 1, x1:x2 + 1].astype(np.float16),
                "xyxy": (int(x1), int(y1), int(x2), int(y2)),
            }, f)
        n_done += 1
        if n_done % 200 == 0:
            print(f"{n_done} crops written")
    print(f"done: {n_done} crops")


if __name__ == "__main__":
    main()
