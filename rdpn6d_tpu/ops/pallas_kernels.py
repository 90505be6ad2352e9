"""Pallas TPU kernels for the hot reduction ops.

The dense pairwise point-distance reduction is the inner loop of both ADI
evaluation (evaluation/pose_error.py adi — the reference uses a host
cKDTree, pose_error.py:316-337) and region assignment (scipy cdist in the
reference loader, data_utils.py:229-253). Here it is a tiled Pallas kernel:
A-tiles stay resident in VMEM while B streams through in chunks; the
distance matrix is formed as |a|^2 - 2 a.b + |b|^2 with the cross term on
the MXU, and only the running row-minimum is materialized — O(TN*TM) VMEM
instead of the O(N*M) distance matrix XLA would buffer.

On non-TPU backends the public entry points fall back to the XLA
formulation (identical math).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 256   # A-tile rows per grid step
_TM = 512   # B chunk rows per inner iteration


def _min_dist_kernel(a_ref, b_ref, out_ref):
    """a [TN, D] in VMEM; b [M, D] in VMEM; out [1, TN] running min."""
    a = a_ref[:]
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)          # [TN, 1]
    M = b_ref.shape[0]
    n_chunks = M // _TM

    def body(c, best):
        b = b_ref[pl.ds(c * _TM, _TM), :]
        b2 = jnp.sum(b * b, axis=-1)[None, :]            # [1, TM]
        cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        d2 = a2 - 2.0 * cross + b2                       # [TN, TM]
        return jnp.minimum(best, jnp.min(d2, axis=-1))

    init = jnp.full((a.shape[0],), jnp.inf, jnp.float32)
    out_ref[pl.program_id(0), :] = jax.lax.fori_loop(0, n_chunks, body, init)


def _pad_rows(x: jax.Array, mult: int, fill: float) -> jax.Array:
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)
    return x


@partial(jax.jit, static_argnames=("interpret",))
def min_dist2_pallas(a: jax.Array, b: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """For each a-point the min squared distance to any b-point.

    a [N, D], b [M, D] -> [N] float32. Pads internally to tile multiples
    (pad b rows sit at +1e9 — squared, 1e18, is comfortably inside f32 —
    so they can never win the min even for mm-unit clouds, matching
    pose_error.adi's sentinel).
    """
    n = a.shape[0]
    a_p = _pad_rows(a.astype(jnp.float32), _TN, 0.0)
    b_p = _pad_rows(b.astype(jnp.float32), _TM, 1e9)
    grid = a_p.shape[0] // _TN

    out = pl.pallas_call(
        _min_dist_kernel,
        out_shape=jax.ShapeDtypeStruct((grid, _TN), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TN, a_p.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_p.shape[0], b_p.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((grid, _TN), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_p, b_p)
    return out.reshape(-1)[:n]


def min_dist2_xla(a: jax.Array, b: jax.Array) -> jax.Array:
    """Reference XLA formulation (used on CPU and as the test oracle)."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1)[None, :]
    d2 = a2 - 2.0 * (a @ b.T) + b2
    return jnp.min(d2, axis=-1)


def min_dist2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Backend-dispatching entry: Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return min_dist2_pallas(a, b)
    return min_dist2_xla(a, b)


def adi_distance(R_est, t_est, R_gt, t_gt, pts) -> jax.Array:
    """ADI via the Pallas reduction for one pose pair (host-loop friendly)."""
    pe = pts @ R_est.T + t_est
    pg = pts @ R_gt.T + t_gt
    return jnp.mean(jnp.sqrt(jnp.maximum(min_dist2(pg, pe), 0.0)))
