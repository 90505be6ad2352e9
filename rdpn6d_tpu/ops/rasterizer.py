"""Python binding for the native software rasterizer.

Counterpart of the reference's ``Renderer.render`` API
(lib/meshrenderer/meshrenderer_phong.py:125): depth + model-coordinate maps
for a mesh under (K, R, t) — no OpenGL/EGL context, just
``csrc/rasterizer/rasterizer.cpp`` via ctypes. Used by the GT xyz-crop tool
(tools/gen_xyz_crop.py) and the VSD evaluator.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                      "csrc", "rasterizer",
                                      "librasterizer.so"))
    src = os.path.join(os.path.dirname(so), "rasterizer.cpp")
    build_err = ""
    if not os.path.exists(so) or (os.path.exists(src) and
                                  os.path.getmtime(src)
                                  > os.path.getmtime(so)):
        # (re)build when missing OR the source is newer than the binary
        import subprocess

        try:
            proc = subprocess.run(["make", "-C", os.path.dirname(so), "-B"],
                                  check=False, capture_output=True, text=True)
            if proc.returncode != 0:
                build_err = proc.stderr[-2000:]
        except FileNotFoundError:
            build_err = "`make` not found on this machine"
    if not os.path.exists(so):
        raise RuntimeError(
            f"rasterizer library not built; run: make -C "
            f"{os.path.dirname(so)}"
            + (f"\nbuild error:\n{build_err}" if build_err else ""))
    lib = ctypes.CDLL(so)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.render_mesh.argtypes = [f32p, ctypes.c_int, i32p, ctypes.c_int,
                                f32p, f32p, f32p, ctypes.c_int,
                                ctypes.c_int, f32p, f32p]
    _LIB = lib
    return lib


def render_mesh(verts: np.ndarray, faces: np.ndarray, K: np.ndarray,
                R: np.ndarray, t: np.ndarray, height: int,
                width: int) -> tuple[np.ndarray, np.ndarray]:
    """Render depth [H, W] and model-frame xyz [H, W, 3] maps.

    verts [V,3] (model frame, meters), faces [F,3] int, K/R [3,3], t [3].
    """
    lib = _load()
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    depth = np.zeros((height, width), np.float32)
    xyz = np.zeros((height, width, 3), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.render_mesh(
        v.ctypes.data_as(f32p), len(v),
        f.ctypes.data_as(i32p), len(f),
        np.ascontiguousarray(K, np.float32).ctypes.data_as(f32p),
        np.ascontiguousarray(R, np.float32).ctypes.data_as(f32p),
        np.ascontiguousarray(t, np.float32).ctypes.data_as(f32p),
        height, width,
        depth.ctypes.data_as(f32p), xyz.ctypes.data_as(f32p))
    return depth, xyz
