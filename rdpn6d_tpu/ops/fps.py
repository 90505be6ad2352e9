"""Farthest point sampling.

Counterpart of the reference's C++ cffi extension
``core/csrc/fps/src/farthest_point_sampling.cpp:76-204``. Three backends:

  * ``fps_jax`` — an O(KN) ``lax.fori_loop`` implementation, vmappable over a
    batch of (padded) point clouds; runs on TPU.
  * ``fps_numpy`` — exact host reference used by the offline tools.
  * ``fps_native`` — ctypes binding to our own C++ kernel
    (``rdpn6d_tpu/csrc/fps/fps.cpp``), fastest for big meshes on the host.

All backends implement the deterministic ``init_center`` variant: the running
min-distance is seeded from the bbox center so the first selected point is the
farthest vertex from the center (the reference's non-center variant seeds from
``rand()`` with ``srand(time(0))`` — a nondeterminism we do not replicate;
pass ``seed`` instead).
"""

from __future__ import annotations

import ctypes
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_NATIVE = None


def _load_native():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    so = os.path.join(os.path.dirname(__file__), "..", "csrc", "fps",
                      "libfps.so")
    so = os.path.abspath(so)
    src = os.path.join(os.path.dirname(so), "fps.cpp")
    if not os.path.exists(so) or (os.path.exists(src) and
                                  os.path.getmtime(src)
                                  > os.path.getmtime(so)):
        # (re)build when missing OR the source is newer than the binary
        import logging
        import subprocess

        try:
            proc = subprocess.run(["make", "-C", os.path.dirname(so), "-B"],
                                  check=False, capture_output=True, text=True)
            if proc.returncode != 0:
                logging.getLogger("rdpn6d").warning(
                    "fps native build failed:\n%s", proc.stderr[-2000:])
        except FileNotFoundError:
            # no `make` on this machine: the numpy fallback covers it
            pass
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.farthest_point_sampling_init_center.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int]
    lib.farthest_point_sampling_seeded.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _NATIVE = lib
    return lib


# ---------------------------------------------------------------------------
# JAX backend
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_samples",))
def fps_jax(points: jax.Array, num_samples: int,
            valid_mask: jax.Array | None = None) -> jax.Array:
    """Deterministic init-center FPS. points [N, 3] -> indices [num_samples].

    valid_mask: optional [N] bool; padded points are never selected and do not
    affect the bbox center. vmap over a leading batch dim for many models.
    """
    n = points.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)
    big = jnp.asarray(jnp.finfo(points.dtype).max)
    pmax = jnp.max(jnp.where(valid_mask[:, None], points, -big), axis=0)
    pmin = jnp.min(jnp.where(valid_mask[:, None], points, big), axis=0)
    center = (pmax + pmin) / 2.0

    d0 = jnp.sum((points - center) ** 2, axis=-1)
    min_dist = jnp.where(valid_mask, d0, -big)

    # invalid points sit at -inf, exhausted VALID points at -big: when
    # num_samples exceeds the valid count, argmax ties resolve among
    # valid (already-selected) points — never onto padding coordinates
    neg_inf = -jnp.asarray(jnp.inf, points.dtype)
    min_dist = jnp.where(valid_mask, min_dist, neg_inf)

    def body(i, carry):
        min_dist, idxs = carry
        cur = jnp.argmax(min_dist)
        idxs = idxs.at[i].set(cur)
        d = jnp.sum((points - points[cur]) ** 2, axis=-1)
        min_dist = jnp.minimum(min_dist, jnp.where(valid_mask, d, -big))
        # never reselect (duplicate-point guard, matches the C++ mask)
        min_dist = min_dist.at[cur].set(-big)
        return min_dist, idxs

    _, idxs = jax.lax.fori_loop(
        0, num_samples, body,
        (min_dist, jnp.zeros((num_samples,), dtype=jnp.int32)))
    return idxs


def fps_points_jax(points: jax.Array, num_samples: int,
                   valid_mask: jax.Array | None = None) -> jax.Array:
    """FPS sample coordinates [num_samples, 3]."""
    return points[fps_jax(points, num_samples, valid_mask)]


# ---------------------------------------------------------------------------
# NumPy backend
# ---------------------------------------------------------------------------

def fps_numpy(points: np.ndarray, num_samples: int,
              init_center: bool = True, seed: int = 0) -> np.ndarray:
    """Host-exact FPS indices [num_samples]."""
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    if init_center:
        center = (pts.max(0) + pts.min(0)) / 2.0
        min_dist = np.sum((pts - center) ** 2, axis=-1)
        cur = int(np.argmax(min_dist))
    else:
        rng = np.random.RandomState(seed)
        cur = int(rng.randint(n))
        min_dist = np.full((n,), np.inf)
    idxs = np.empty((num_samples,), dtype=np.int32)
    for i in range(num_samples):
        idxs[i] = cur
        d = np.sum((pts - pts[cur]) ** 2, axis=-1)
        np.minimum(min_dist, d, out=min_dist)
        min_dist[cur] = -np.inf  # never reselect
        cur = int(np.argmax(min_dist))
    return idxs


def fps_native(points: np.ndarray, num_samples: int,
               init_center: bool = True, seed: int = 0) -> np.ndarray:
    """C++ FPS indices; falls back to numpy if the library is not built."""
    lib = _load_native()
    if lib is None:
        return fps_numpy(points, num_samples, init_center, seed)
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.zeros((num_samples,), dtype=np.int32)
    p = pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    o = out.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    if init_center:
        lib.farthest_point_sampling_init_center(p, o, pts.shape[0],
                                                num_samples)
    else:
        lib.farthest_point_sampling_seeded(p, o, pts.shape[0], num_samples,
                                           seed)
    return out


def get_fps_and_center(points: np.ndarray, num_fps: int,
                       backend: str = "native") -> np.ndarray:
    """FPS keypoints + mean-center appended, [num_fps + 1, 3].

    Mirrors the reference's ``get_fps_and_center`` (data_utils.py:217-228):
    the appended point is the MEAN of the vertices, not the bbox center.
    """
    backends = {"native": fps_native, "numpy": fps_numpy}
    if backend not in backends:
        # a silent numpy fallback would mask a typo as a many-seconds-
        # per-object slowdown on large meshes
        raise ValueError(f"unknown fps backend {backend!r} "
                         f"(choose from {sorted(backends)})")
    fn = backends[backend]
    idx = fn(points, num_fps)
    return np.concatenate(
        [np.asarray(points)[idx],
         np.mean(np.asarray(points), axis=0, keepdims=True)], axis=0
    ).astype(np.float32)
