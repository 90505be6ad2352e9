"""Pose-error metrics: ADD, ADI, re, te, proj — batched JAX and host numpy.

Counterpart of the reference's ``lib/pysixd/pose_error.py`` (add :297, adi
:316 via cKDTree, re :391, te :403, proj/arp_2d :22). The on-device variants
are fully batched; ADI's nearest-neighbor search is a tiled pairwise-min
distance (an [N, M] matmul-shaped reduction — MXU/VPU-friendly) instead of a
KD-tree, chunked to bound memory for fine meshes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import angular_distance, project, transform_pts


def add(R_est: jax.Array, t_est: jax.Array, R_gt: jax.Array,
        t_gt: jax.Array, pts: jax.Array) -> jax.Array:
    """Average model-point distance. Batched: [...,3,3],[...,3],[...,N,3]."""
    pe = transform_pts(pts, R_est, t_est)
    pg = transform_pts(pts, R_gt, t_gt)
    return jnp.mean(jnp.linalg.norm(pe - pg, axis=-1), axis=-1)


@partial(jax.jit, static_argnames=("chunk",))
def adi(R_est: jax.Array, t_est: jax.Array, R_gt: jax.Array,
        t_gt: jax.Array, pts: jax.Array, chunk: int = 512) -> jax.Array:
    """Average closest-point distance (symmetric ADD).

    For each GT-posed point, min distance to ANY estimated-posed point,
    computed as chunked dense [N, M] distance minima on device.
    """
    pe = transform_pts(pts, R_est, t_est)   # [..., N, 3]
    pg = transform_pts(pts, R_gt, t_gt)

    n = pg.shape[-2]
    n_chunks = max(1, (n + chunk - 1) // chunk)
    pad = n_chunks * chunk - n
    pg_pad = jnp.concatenate(
        [pg, jnp.full(pg.shape[:-2] + (pad, 3), 1e9, pg.dtype)], axis=-2) \
        if pad else pg
    pg_chunks = pg_pad.reshape(pg.shape[:-2] + (n_chunks, chunk, 3))

    def one_chunk(g):
        # g [..., chunk, 3] vs pe [..., M, 3]
        d2 = (jnp.sum(g * g, -1)[..., :, None]
              - 2 * jnp.einsum("...cd,...md->...cm", g, pe)
              + jnp.sum(pe * pe, -1)[..., None, :])
        return jnp.min(d2, axis=-1)  # [..., chunk]

    d2_list = [one_chunk(pg_chunks[..., i, :, :]) for i in range(n_chunks)]
    d2 = jnp.concatenate(d2_list, axis=-1)[..., :n]
    return jnp.mean(jnp.sqrt(jnp.maximum(d2, 0.0)), axis=-1)


def re_deg(R_est: jax.Array, R_gt: jax.Array) -> jax.Array:
    """Rotation error in degrees (pose_error.py:391)."""
    return angular_distance(R_est, R_gt) * (180.0 / jnp.pi)


def te(t_est: jax.Array, t_gt: jax.Array) -> jax.Array:
    """Translation error (same unit as inputs; pose_error.py:403)."""
    return jnp.linalg.norm(t_est - t_gt, axis=-1)


def proj_2d(R_est: jax.Array, t_est: jax.Array, R_gt: jax.Array,
            t_gt: jax.Array, pts: jax.Array, K: jax.Array) -> jax.Array:
    """Mean 2D reprojection distance in pixels (arp_2d, pose_error.py:22)."""
    pe = project(pts, K, R_est, t_est)
    pg = project(pts, K, R_gt, t_gt)
    return jnp.mean(jnp.linalg.norm(pe - pg, axis=-1), axis=-1)


# ---------------------------------------------------------------------------
# host (numpy/scipy) exact versions for the scoring path
# ---------------------------------------------------------------------------

def add_np(R_est, t_est, R_gt, t_gt, pts):
    pe = pts @ R_est.T + t_est
    pg = pts @ R_gt.T + t_gt
    return float(np.linalg.norm(pe - pg, axis=1).mean())


def adi_np(R_est, t_est, R_gt, t_gt, pts):
    from scipy import spatial

    pe = pts @ R_est.T + t_est
    pg = pts @ R_gt.T + t_gt
    nn, _ = spatial.cKDTree(pe).query(pg, k=1)
    return float(nn.mean())


def re_np(R_est, R_gt):
    cos = np.clip((np.trace(R_est.T @ R_gt) - 1.0) / 2.0, -1.0, 1.0)
    return float(np.degrees(np.arccos(cos)))


def te_np(t_est, t_gt):
    return float(np.linalg.norm(np.asarray(t_est) - np.asarray(t_gt)))


def proj_2d_np(R_est, t_est, R_gt, t_gt, pts, K):
    def prj(R, t):
        p = (pts @ R.T + t) @ K.T
        return p[:, :2] / p[:, 2:3]

    return float(np.linalg.norm(prj(R_est, t_est) - prj(R_gt, t_gt),
                                axis=1).mean())
