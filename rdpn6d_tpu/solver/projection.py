"""AdamP / SGDP: projection optimizers for scale-invariant weights.

Counterpart of the reference's ``lib/torch_utils/solver/adamp.py`` and
``sgdp.py`` (Heo et al., "AdamP: Slowing Down the Slowdown for Momentum
Optimizers on Scale-invariant Weights"), reachable there via
``core/utils/solver_utils.py:32-37`` (OPTIMIZER_CFG type "AdamP"/"SGDP").

The idea: weights that feed a normalization layer are scale-invariant —
only their *direction* matters — yet momentum accumulates a radial
(norm-growing) component that effectively decays the learning rate. When
the gradient is detected to be near-orthogonal to the weight (cosine
similarity below ``delta/sqrt(cols)`` in either a per-channel or whole-
layer view), the radial component of the update is projected out and
weight decay is damped by ``wd_ratio``.

Re-derived as monolithic optax transformations (they need the RAW
gradient for the cosine test *and* the momentum-transformed update for
the projection, so they cannot be composed from stock optax pieces).
The data-dependent two-view cascade (try channel view, else layer view,
else pass through) is branchless ``jnp.where`` selection so the whole
optimizer jits into the SPMD train step.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

__all__ = ["adamp", "sgdp", "project_scale_invariant"]


def _lr_at(learning_rate, count):
    if callable(learning_rate):
        return learning_rate(count)
    return learning_rate


def _rowwise_cos(a, b, rows: int, eps: float):
    """|cosine| between matching rows of a and b viewed as (rows, -1).

    Matches torch ``F.cosine_similarity(x, y, dim=1, eps)``:
    x.y / max(||x||*||y||, eps).
    """
    a2 = a.reshape(rows, -1)
    b2 = b.reshape(rows, -1)
    dot = jnp.sum(a2 * b2, axis=1)
    denom = jnp.maximum(
        jnp.linalg.norm(a2, axis=1) * jnp.linalg.norm(b2, axis=1), eps)
    return jnp.abs(dot / denom)


def _project_rows(p, u, rows: int, eps: float):
    """Remove from ``u`` its component along ``p``, row-wise in the
    (rows, -1) view; returns the projected update reshaped like ``u``."""
    p2 = p.reshape(rows, -1)
    u2 = u.reshape(rows, -1)
    p_n = p2 / (jnp.linalg.norm(p2, axis=1, keepdims=True) + eps)
    proj = u2 - p_n * jnp.sum(p_n * u2, axis=1, keepdims=True)
    return proj.reshape(u.shape)


def project_scale_invariant(p, g, u, delta: float, eps: float):
    """The AdamP two-view projection cascade for one parameter.

    Returns ``(new_update, projected)`` where ``projected`` is a scalar
    bool array — True when either view fired (caller scales weight decay
    by ``wd_ratio`` in that case). Parameters with ndim <= 1 pass
    through untouched (adamp.py:92 guards ``len(p.shape) > 1``).
    """
    if p.ndim <= 1:
        return u, jnp.asarray(False)
    rows_c = p.shape[0]
    cols_c = math.prod(p.shape[1:])
    cols_l = p.size
    cond_c = jnp.max(_rowwise_cos(g, p, rows_c, eps)) < (
        delta / math.sqrt(cols_c))
    cond_l = jnp.max(_rowwise_cos(g, p, 1, eps)) < (
        delta / math.sqrt(cols_l))
    u_c = _project_rows(p, u, rows_c, eps)
    u_l = _project_rows(p, u, 1, eps)
    new_u = jnp.where(cond_c, u_c, jnp.where(cond_l, u_l, u))
    return new_u, cond_c | cond_l


class AdamPState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def adamp(learning_rate: optax.ScalarOrSchedule,
          b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
          weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1,
          nesterov: bool = False) -> optax.GradientTransformation:
    """AdamP. Emits the FULL update (lr folded in): Adam moments ->
    projection -> decoupled weight decay damped by ``wd_ratio`` on
    projected params -> step (adamp.py:50-102)."""

    def init_fn(params):
        return AdamPState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params):
        assert params is not None, "adamp requires params"
        count = state.count + 1
        lr = _lr_at(learning_rate, count)
        t = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        step_size = lr / bc1

        def one(p, g, m, v):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            if nesterov:
                perturb = (b1 * m + (1 - b1) * g) / denom
            else:
                perturb = m / denom
            perturb, projected = project_scale_invariant(
                p, g, perturb, delta, eps)
            wd = jnp.where(projected, wd_ratio, 1.0)
            # p_new = p*(1 - lr*weight_decay*wd) - step_size*perturb
            upd = -step_size * perturb
            if weight_decay > 0:
                upd = upd - lr * weight_decay * wd * p
            return upd

        new_updates = jax.tree_util.tree_map(one, params, updates, mu, nu)
        return new_updates, AdamPState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


class SGDPState(NamedTuple):
    count: chex.Array
    momentum: optax.Updates


def sgdp(learning_rate: optax.ScalarOrSchedule,
         momentum: float = 0.9, dampening: float = 0.0,
         weight_decay: float = 0.0, nesterov: bool = False,
         eps: float = 1e-8, delta: float = 0.1,
         wd_ratio: float = 0.1) -> optax.GradientTransformation:
    """SGDP: SGD-with-momentum + the same projection (sgdp.py:66-104).

    Note the reference's weight-decay compensation: the decay factor is
    ``lr * weight_decay * wd / (1 - momentum)`` — scaled up so decoupled
    decay has comparable strength to its coupled-SGD equivalent.
    """

    def init_fn(params):
        return SGDPState(
            count=jnp.zeros([], jnp.int32),
            momentum=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params):
        assert params is not None, "sgdp requires params"
        count = state.count + 1
        lr = _lr_at(learning_rate, count)
        buf = jax.tree_util.tree_map(
            lambda b, g: momentum * b + (1 - dampening) * g,
            state.momentum, updates)

        def one(p, g, b):
            d_p = g + momentum * b if nesterov else b
            d_p, projected = project_scale_invariant(p, g, d_p, delta, eps)
            wd = jnp.where(projected, wd_ratio, 1.0)
            upd = -lr * d_p
            if weight_decay > 0:
                upd = upd - lr * weight_decay * wd / (1 - momentum) * p
            return upd

        new_updates = jax.tree_util.tree_map(one, params, updates, buf)
        return new_updates, SGDPState(count=count, momentum=buf)

    return optax.GradientTransformation(init_fn, update_fn)
