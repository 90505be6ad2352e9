"""Object symmetry handling: discretized symmetry sets and closest-rotation
selection, designed for fixed-shape on-device batching.

Counterpart of the reference's ``lib/pysixd/misc.py:206-255``
(get_symmetry_transformations) and ``core/utils/pose_utils.py:430-484``
(get_closest_rot[_batch]). The reference loops over symmetries per-sample on
the host; here each class carries a PADDED [K, 3, 3] symmetry-rotation bank
(identity-padded — identity is always a valid symmetry member) and the closest
GT rotation is selected with a vmapped argmin, so the symmetric point-matching
loss stays inside the jitted train step.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import angular_distance


def symmetry_transforms(model_info: dict[str, Any],
                        max_sym_disc_step: float = 0.01,
                        trans_scale: float = 1e-3
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Discrete + discretized-continuous symmetry TRANSFORMS for one model.

    model_info follows BOP models_info.json keys: ``symmetries_discrete``
    (flattened 4x4 row-major, translation in the mesh's native unit
    -- MM for BOP; ``trans_scale`` converts to meters, pass the dataset's
    ``vertex_scale``) and
    ``symmetries_continuous`` ({axis, offset}). Mirrors the BOP toolkit's
    ``misc.get_symmetry_transformations`` (lib/pysixd/misc.py:206-254),
    with the identity-continuous element re-added so the plain discrete
    transforms survive the combination. Returns (rots [K,3,3],
    trans [K,3]) float32, translations in METERS, identity first.
    """
    disc = [(np.eye(3, dtype=np.float64), np.zeros(3))]
    for sym in model_info.get("symmetries_discrete", []):
        m = np.reshape(np.asarray(sym, dtype=np.float64), (4, 4))
        disc.append((m[:3, :3], m[:3, 3] * trans_scale))

    cont = []
    for sym in model_info.get("symmetries_continuous", []):
        axis = np.asarray(sym["axis"], dtype=np.float64)
        axis = axis / np.linalg.norm(axis)
        offset = np.asarray(sym.get("offset", (0, 0, 0)),
                            dtype=np.float64).reshape(3) * trans_scale
        n_steps = int(math.ceil(math.pi / max_sym_disc_step))
        step = 2.0 * math.pi / n_steps
        for i in range(1, n_steps):
            a = i * step
            c, s = math.cos(a), math.sin(a)
            C = 1.0 - c
            x, y, z = axis
            R = np.array([
                [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
                [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
                [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
            ])
            cont.append((R, -R @ offset + offset))

    if cont:
        out = [(Rc @ Rd, Rc @ td + tc)
               for Rd, td in disc
               for Rc, tc in [(np.eye(3), np.zeros(3))] + cont]
    else:
        out = disc
    rots = np.stack([r for r, _ in out]).astype(np.float32)
    trans = np.stack([t for _, t in out]).astype(np.float32)
    return rots, trans


def symmetry_rotations(model_info: dict[str, Any],
                       max_sym_disc_step: float = 0.01) -> np.ndarray:
    """Rotation parts only — what the PM loss consumes (the reference's
    get_closest_rot also only uses R, pm_loss.py:99-101). MSSD/MSPD need
    the full transforms (:func:`symmetry_transforms`)."""
    return symmetry_transforms(model_info, max_sym_disc_step)[0]


def pad_symmetries(sym_list: list[np.ndarray | None],
                   max_syms: int | None = None) -> np.ndarray:
    """Stack per-class symmetry banks into one identity-padded array.

    sym_list: per-class [K_i, 3, 3] (or None for asymmetric objects).
    Returns [num_classes, K_max, 3, 3] float32.
    """
    banks = [np.eye(3, dtype=np.float32)[None] if s is None or len(s) == 0
             else np.asarray(s, dtype=np.float32) for s in sym_list]
    K = max_syms or max(b.shape[0] for b in banks)
    biggest = max(b.shape[0] for b in banks)
    if biggest > K:
        # silently dropping symmetry elements would make closest_rot pick
        # a suboptimal equivalent and quietly inflate PM/MSSD/MSPD
        raise ValueError(
            f"max_syms={K} truncates a symmetry bank of {biggest} "
            "rotations — raise max_syms (or pass None to size "
            "automatically)")
    out = np.tile(np.eye(3, dtype=np.float32), (len(banks), K, 1, 1))
    for i, b in enumerate(banks):
        out[i, :b.shape[0]] = b
    return out


def pad_sym_trans(trans_list: list[np.ndarray | None],
                  max_syms: int | None = None) -> np.ndarray:
    """Zero-padded companion of :func:`pad_symmetries` for the symmetry
    TRANSLATIONS: [num_classes, K_max, 3] float32 (meters)."""
    banks = [np.zeros((1, 3), np.float32) if t is None or len(t) == 0
             else np.asarray(t, dtype=np.float32) for t in trans_list]
    K = max_syms or max(b.shape[0] for b in banks)
    biggest = max(b.shape[0] for b in banks)
    if biggest > K:
        raise ValueError(
            f"max_syms={K} truncates a symmetry-translation bank of "
            f"{biggest} entries — must match pad_symmetries sizing")
    out = np.zeros((len(banks), K, 3), np.float32)
    for i, b in enumerate(banks):
        out[i, :b.shape[0]] = b
    return out


def closest_rot(rot_est: jax.Array, rot_gt: jax.Array,
                sym_rots: jax.Array) -> jax.Array:
    """Symmetry-equivalent GT rotation closest (geodesically) to the estimate.

    rot_est/rot_gt: [..., 3, 3]; sym_rots: [..., K, 3, 3] (identity-padded).
    Returns [..., 3, 3] = rot_gt @ sym_rots[k*] with k* minimizing the angular
    distance to rot_est.
    """
    cands = rot_gt[..., None, :, :] @ sym_rots  # [..., K, 3, 3]
    d = angular_distance(rot_est[..., None, :, :], cands)  # [..., K]
    best = jnp.argmin(d, axis=-1)
    return jnp.take_along_axis(
        cands, best[..., None, None, None], axis=-3)[..., 0, :, :]
