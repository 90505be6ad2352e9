#!/usr/bin/env python
"""Render a complete miniature BOP dataset with the native rasterizer.

The full-protocol rehearsal fixture (VERDICT r2 #3): 3 LM objects — an
irregular tetrahedron ("ape", asymmetric), a cube ("can", 4-fold discrete
z symmetry declared in models_info.json) and an L-prism ("driller",
asymmetric) — rendered into reserved lm scenes 91 (train) / 92 (test)
with multi-object images, real occlusions (z-buffer compositing),
scene_gt/scene_camera/scene_gt_info, models + models_eval, a BOP19
targets json, and an est-detections json with jittered boxes and misses.

RGB carries signal correlated with model coordinates (NOCS-style albedo
+ Lambert shading) so the coordinate head has something to learn from,
like the reference's textured meshes.

Usage: python tools/make_mini_bop.py --out DIR [--n-train 60 --n-test 10]
Then:  RDPN6D_DATA_ROOT=DIR tools/rehearse_protocol.py drives the REAL
       compute_fps -> gen_xyz_crop -> train -> eval -> score_csv chain.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TRAIN_SCENE, TEST_SCENE = 91, 92
OBJS = {1: "ape", 5: "can", 8: "driller"}
K_CAM = np.array([[572.4114, 0.0, 325.2611],
                  [0.0, 573.57043, 242.04899],
                  [0.0, 0.0, 1.0]], np.float64)
H, W = 480, 640


def _subdivide(verts: np.ndarray, faces: np.ndarray,
               n: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """Midpoint subdivision: denser vertex sets for FPS/PM sampling."""
    for _ in range(n):
        edge_mid: dict[tuple[int, int], int] = {}
        verts = list(map(tuple, verts))

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                edge_mid[key] = len(verts)
                verts.append(tuple((np.asarray(verts[a])
                                    + np.asarray(verts[b])) / 2.0))
            return edge_mid[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [(a, ab, ca), (ab, b, bc), (ca, bc, c),
                          (ab, bc, ca)]
        verts = np.asarray(verts, np.float64)
        faces = np.asarray(new_faces, np.int32)
    return np.asarray(verts, np.float64), np.asarray(faces, np.int32)


def _box(cx, cy, cz, hx, hy, hz):
    v = np.array([(cx + sx * hx, cy + sy * hy, cz + sz * hz)
                  for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                 np.float64)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    f = np.array([t for a, b, c, d in quads
                  for t in ((a, b, c), (a, c, d))], np.int32)
    return v, f


def _merge(parts):
    verts, faces, off = [], [], 0
    for v, f in parts:
        verts.append(v)
        faces.append(f + off)
        off += len(v)
    return np.concatenate(verts), np.concatenate(faces)


def build_meshes() -> dict[int, tuple[np.ndarray, np.ndarray]]:
    """-> {obj_id: (verts_mm, faces)}, all centered near origin."""
    # ape: irregular tetrahedron (asymmetric), ~90 mm across
    v = np.array([[0, 0, 55], [50, -30, -35], [-45, -35, -30],
                  [5, 60, -30]], np.float64)
    f = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]], np.int32)
    ape = _subdivide(v, f, 3)

    # can: 80 mm cube (4-fold z symmetry declared)
    v, f = _box(0, 0, 0, 40, 40, 40)
    can = _subdivide(v, f, 2)

    # driller: L-prism = two overlapping cuboids (asymmetric)
    v, f = _merge([_box(10, -27.5, 0, 50, 12.5, 20),
                   _box(-27.5, 12.5, 0, 12.5, 27.5, 20)])
    driller = _subdivide(v, f, 2)
    return {1: ape, 5: can, 8: driller}


def write_ply(path: str, verts_mm: np.ndarray, faces: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lines = ["ply", "format ascii 1.0", f"element vertex {len(verts_mm)}",
             "property float x", "property float y", "property float z",
             f"element face {len(faces)}",
             "property list uchar int vertex_indices", "end_header"]
    lines += [f"{x:.4f} {y:.4f} {z:.4f}" for x, y, z in verts_mm]
    lines += [f"3 {a} {b} {c}" for a, b, c in faces]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _models_info(meshes) -> dict:
    info = {}
    for oid, (v, _) in meshes.items():
        lo, hi = v.min(0), v.max(0)
        # exact max pairwise distance over the (subdivided) vertex set
        d2 = ((v[:, None, :] - v[None, :, :]) ** 2).sum(-1)
        entry = {
            "diameter": float(np.sqrt(d2.max())),
            "min_x": float(lo[0]), "min_y": float(lo[1]),
            "min_z": float(lo[2]),
            "size_x": float(hi[0] - lo[0]), "size_y": float(hi[1] - lo[1]),
            "size_z": float(hi[2] - lo[2]),
        }
        if oid == 5:  # cube: 4-fold z rotations (non-identity)
            syms = []
            for k in (1, 2, 3):
                a = np.pi / 2 * k
                Rz = np.array([[np.cos(a), -np.sin(a), 0],
                               [np.sin(a), np.cos(a), 0], [0, 0, 1]])
                T = np.eye(4)
                T[:3, :3] = Rz
                syms.append(T.reshape(-1).tolist())
            entry["symmetries_discrete"] = syms
        info[str(oid)] = entry
    return info


def _rand_rot(rng) -> np.ndarray:
    A = rng.randn(3, 3)
    Q, R = np.linalg.qr(A)
    Q *= np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


def render_scene_image(meshes_m, insts, rng):
    """insts: [(obj_id, R, t)] -> (rgb u8, depth m, per-inst visib masks,
    per-inst full masks)."""
    from rdpn6d_tpu.ops.rasterizer import render_mesh

    depths, xyzs = [], []
    for oid, R, t in insts:
        v, f = meshes_m[oid]
        d, x = render_mesh(v, f, K_CAM, R, t, H, W)
        depths.append(d)
        xyzs.append(x)
    depth = np.zeros((H, W), np.float32)
    owner = np.full((H, W), -1, np.int32)
    for i, d in enumerate(depths):
        m = (d > 0) & ((depth <= 0) | (d < depth))
        depth = np.where(m, d, depth)
        owner = np.where(m, i, owner)

    rgb = rng.randint(30, 70, (H, W, 3)).astype(np.float32)  # bg noise
    for i, ((oid, R, t), x) in enumerate(zip(insts, xyzs)):
        vis = owner == i
        v, _ = meshes_m[oid]
        ext = v.max(0) - v.min(0)
        albedo = (x / ext + 0.5) * 175.0 + 40.0        # NOCS-style color
        # cheap Lambert: shade by depth gradient magnitude
        shade = 1.0 - np.clip(np.abs(np.gradient(
            np.where(vis, depth, 0.0))[0]) * 200.0, 0.0, 0.5)
        rgb = np.where(vis[..., None], albedo * shade[..., None], rgb)
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    visib = [(owner == i) for i in range(len(insts))]
    full = [(d > 0) for d in depths]
    return rgb, depth, visib, full


def write_scene(root, subdir, scene_id, n_images, meshes_m, rng,
                targets=None, dets=None, miss_every=0):
    import cv2

    sdir = os.path.join(root, "lm", subdir, f"{scene_id:06d}")
    for sub in ("rgb", "depth", "mask_visib"):
        os.makedirs(os.path.join(sdir, sub), exist_ok=True)
    scene_gt, scene_cam, scene_info = {}, {}, {}
    obj_ids = sorted(meshes_m)
    n_rois = 0
    for im_id in range(n_images):
        n_obj = rng.randint(2, len(obj_ids) + 1)
        chosen = rng.choice(obj_ids, size=n_obj, replace=False)
        insts = []
        base_xy = rng.uniform(-0.06, 0.06, 2)
        for j, oid in enumerate(chosen):
            R = _rand_rot(rng)
            # cluster around base_xy so objects occlude each other
            t = np.array([base_xy[0] + rng.uniform(-0.07, 0.07),
                          base_xy[1] + rng.uniform(-0.06, 0.06),
                          rng.uniform(0.55, 0.85)])
            insts.append((int(oid), R, t))
        rgb, depth, visib, full = render_scene_image(meshes_m, insts, rng)

        gts, infos = [], []
        keep = []
        for j, ((oid, R, t), mv, mf) in enumerate(zip(insts, visib, full)):
            # fully-occluded GTs are KEPT (visib_fract ~0): the train
            # visib filter and eval targets handle them, like real BOP
            vf = float(mv.sum()) / max(float(mf.sum()), 1.0)
            ys, xs = np.nonzero(mv)
            if xs.size == 0:
                bbox = [0, 0, 0, 0]
            else:
                bbox = [int(xs.min()), int(ys.min()),
                        int(xs.max() - xs.min() + 1),
                        int(ys.max() - ys.min() + 1)]
            gts.append({"cam_R_m2c": R.reshape(-1).tolist(),
                        "cam_t_m2c": (t * 1000.0).tolist(),
                        "obj_id": int(oid)})
            infos.append({"bbox_visib": bbox, "visib_fract": vf})
            keep.append((oid, bbox, vf))
            cv2.imwrite(os.path.join(
                sdir, "mask_visib", f"{im_id:06d}_{j:06d}.png"),
                mv.astype(np.uint8) * 255)
        cv2.imwrite(os.path.join(sdir, "rgb", f"{im_id:06d}.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(sdir, "depth", f"{im_id:06d}.png"),
                    np.round(depth * 1000.0).astype(np.uint16))
        scene_gt[str(im_id)] = gts
        scene_cam[str(im_id)] = {"cam_K": K_CAM.reshape(-1).tolist(),
                                 "depth_scale": 1.0}
        scene_info[str(im_id)] = infos

        if targets is not None:
            counts: dict[int, int] = {}
            for oid, bbox, vf in keep:
                if vf > 0.05:
                    counts[oid] = counts.get(oid, 0) + 1
            for oid, cnt in sorted(counts.items()):
                targets.append({"im_id": im_id, "inst_count": cnt,
                                "obj_id": int(oid),
                                "scene_id": int(scene_id)})
        if dets is not None:
            for oid, bbox, vf in keep:
                n_rois += 1
                if vf <= 0.05:
                    continue        # undetectable sliver
                if miss_every and n_rois % miss_every == 0:
                    continue        # simulated detector miss
                x, y, w_, h_ = bbox
                jit = rng.randint(-3, 4, 4)
                dets.append({
                    "scene_id": int(scene_id), "im_id": im_id,
                    "obj_id": int(oid),
                    "bbox_est": [float(x + jit[0]), float(y + jit[1]),
                                 float(max(w_ + jit[2], 8)),
                                 float(max(h_ + jit[3], 8))],
                    "score": float(rng.uniform(0.5, 1.0)),
                    "time": 0.05,
                })

    with open(os.path.join(sdir, "scene_gt.json"), "w") as f:
        json.dump(scene_gt, f)
    with open(os.path.join(sdir, "scene_camera.json"), "w") as f:
        json.dump(scene_cam, f)
    with open(os.path.join(sdir, "scene_gt_info.json"), "w") as f:
        json.dump(scene_info, f)


def make(out: str, n_train: int = 60, n_test: int = 10,
         seed: int = 0) -> None:
    rng = np.random.RandomState(seed)
    meshes = build_meshes()
    mdir = os.path.join(out, "lm", "models")
    mdir_eval = os.path.join(out, "lm", "models_eval")
    for oid, (v, f) in meshes.items():
        write_ply(os.path.join(mdir, f"obj_{oid:06d}.ply"), v, f)
        write_ply(os.path.join(mdir_eval, f"obj_{oid:06d}.ply"), v, f)
    info = _models_info(meshes)
    for d in (mdir, mdir_eval):
        with open(os.path.join(d, "models_info.json"), "w") as f:
            json.dump(info, f)

    meshes_m = {oid: (v / 1000.0, f) for oid, (v, f) in meshes.items()}
    write_scene(out, "train", TRAIN_SCENE, n_train, meshes_m, rng)
    targets: list = []
    dets: list = []
    write_scene(out, "test", TEST_SCENE, n_test, meshes_m, rng,
                targets=targets, dets=dets, miss_every=9)
    with open(os.path.join(out, "lm", "test_targets_mini.json"),
              "w") as f:
        json.dump(targets, f)
    with open(os.path.join(out, "lm", "detections_mini.json"), "w") as f:
        json.dump(dets, f)
    print(f"mini-BOP written to {out}: {n_train} train / {n_test} test "
          f"images, {len(dets)} detections, {len(targets)} targets")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-train", type=int, default=60)
    p.add_argument("--n-test", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    make(args.out, args.n_train, args.n_test, args.seed)


if __name__ == "__main__":
    main()
