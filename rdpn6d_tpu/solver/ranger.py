"""Ranger optimizer (RAdam + Lookahead + Gradient Centralization) in optax.

Counterpart of the reference's ``lib/torch_utils/solver/ranger.py`` — the
optimizer every shipped RDPN config trains with
(``OPTIMIZER_CFG=dict(type="Ranger", lr=1e-4)``,
configs/gdrn/lm/a6_cPnP_lm13.py:28). Re-derived as pure optax transforms:

  * gradient centralization: subtract the per-filter gradient mean for any
    parameter with ndim > 1 (ranger.py:144-145);
  * RAdam: rectified Adam — SGD-with-momentum steps while the variance
    estimate is not yet tractable (N_sma <= threshold), rectified adaptive
    steps afterwards (ranger.py:154-186);
  * Lookahead: every k steps pull the fast weights toward a slow EMA copy
    (ranger.py:192-199) — implemented branchlessly with jnp.where so the
    update jits into the SPMD train step.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


def centralize_gradients(conv_only: bool = False
                         ) -> optax.GradientTransformation:
    """Per-output-filter mean subtraction for params with ndim > 1.

    The reference centralizes over every dim but the OUTPUT-channel axis
    (torch layouts put it FIRST: Conv OIHW / Linear (out, in), so it
    reduces dims 1..n — ranger.py:144-145). Flax layouts put the output
    axis LAST (Conv HWIO / Dense (in, out)), so the equivalent reduction
    is over dims 0..n-1; reducing 1..n here would subtract a per-input-
    row mean instead — a silently different regularizer.

    ``conv_only=True`` is the reference's GCC variant (SGD_GCC,
    sgd_gc.py:54 guards ``dim > 3``): centralize only conv kernels
    (ndim > 3), leaving dense/linear weights untouched.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        min_ndim = 3 if conv_only else 1

        def gc(g):
            if g.ndim > min_ndim:
                axes = tuple(range(g.ndim - 1))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree_util.tree_map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class RAdamState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def scale_by_radam_rectified(b1: float = 0.95, b2: float = 0.999,
                             eps: float = 1e-5,
                             n_sma_threshold: float = 5.0,
                             belief: bool = False
                             ) -> optax.GradientTransformation:
    """RAdam scaling with the Ranger variant's thresholded rectification.

    Note the Ranger defaults differ from stock Adam: betas=(.95, .999),
    eps=1e-5 (ranger.py:31-38).

    ``belief=True`` is the AdaBelief variant (ranger_adabelief.py:178-216):
    the second moment tracks the RESIDUAL (g - mu)^2 instead of g^2 —
    "belief" in the gradient direction — and the adaptive denominator
    becomes sqrt(nu + eps) + eps. (The torch code's in-place
    ``exp_avg_sq.add_(eps)`` makes eps accumulate into the state across
    adaptive steps — a bug-like quirk we do NOT reproduce; we apply eps
    non-mutatingly each step, which is the published AdaBelief form.)
    """

    def init_fn(params):
        return RAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        if belief:
            # residual variance needs the NEW mu (torch updates exp_avg
            # in-place before computing grad - exp_avg)
            nu = jax.tree_util.tree_map(
                lambda v, g, m: b2 * v + (1 - b2) * (g - m) * (g - m),
                state.nu, updates, mu)
        else:
            nu = jax.tree_util.tree_map(
                lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)

        t = count.astype(jnp.float32)
        beta2_t = b2 ** t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(
            (1.0 - beta2_t) * (n_sma - 4.0) / (n_sma_max - 4.0)
            * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0)
        ) / (1.0 - b1 ** t)
        plain = 1.0 / (1.0 - b1 ** t)
        use_adaptive = n_sma > n_sma_threshold
        step_size = jnp.where(use_adaptive, rect, plain)

        def upd(m, v):
            if belief:
                adaptive = m / (jnp.sqrt(v + eps) + eps)
            else:
                adaptive = m / (jnp.sqrt(v) + eps)
            return step_size * jnp.where(use_adaptive, adaptive, m)

        new_updates = jax.tree_util.tree_map(upd, mu, nu)
        return new_updates, RAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    count: chex.Array
    slow: optax.Params


def lookahead(alpha: float = 0.5, k: int = 6) -> optax.GradientTransformation:
    """Branchless Lookahead wrapper operating on the UPDATE stream.

    Every k-th step the emitted update is adjusted so the resulting fast
    params land on slow + alpha * (fast_new - slow), and the slow copy is
    refreshed; otherwise the update passes through.
    """

    def init_fn(params):
        return LookaheadState(
            count=jnp.zeros([], jnp.int32),
            slow=jax.tree_util.tree_map(jnp.copy, params),
        )

    def update_fn(updates, state, params):
        assert params is not None, "lookahead requires params"
        count = state.count + 1
        sync = (count % k) == 0

        def adj(u, p, s):
            fast_new = p + u
            synced = s + alpha * (fast_new - s)
            new_u = jnp.where(sync, synced - p, u)
            new_s = jnp.where(sync, synced, s)
            return new_u, new_s

        flat_u, tdef = jax.tree_util.tree_flatten(updates)
        flat_p = tdef.flatten_up_to(params)
        flat_s = tdef.flatten_up_to(state.slow)
        out = [adj(u, p, s) for u, p, s in zip(flat_u, flat_p, flat_s)]
        new_updates = tdef.unflatten([o[0] for o in out])
        new_slow = tdef.unflatten([o[1] for o in out])
        return new_updates, LookaheadState(count=count, slow=new_slow)

    return optax.GradientTransformation(init_fn, update_fn)


def ranger(learning_rate: optax.ScalarOrSchedule, b1: float = 0.95,
           b2: float = 0.999, eps: float = 1e-5, alpha: float = 0.5,
           k: int = 6, n_sma_threshold: float = 5.0,
           weight_decay: float = 0.0,
           use_gc: bool = True) -> optax.GradientTransformation:
    """The full Ranger chain: GC -> RAdam -> weight decay -> lr -> Lookahead."""
    chain = []
    if use_gc:
        chain.append(centralize_gradients())
    chain.append(scale_by_radam_rectified(b1, b2, eps, n_sma_threshold))
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    chain.append(lookahead(alpha, k))
    return optax.chain(*chain)


class RalambState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def ralamb(learning_rate: optax.ScalarOrSchedule, b1: float = 0.9,
           b2: float = 0.999, eps: float = 1e-8,
           weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Ralamb: RAdam with a LARS-style per-parameter trust ratio
    (lib/torch_utils/solver/ralamb.py, the RAdam+LARS half of Over9000).

    Reproduces the reference's exact trust-ratio formulation (which the
    over9000 lineage inherited from the redknightlois gist): the
    denominator norm is taken over the CANDIDATE NEW PARAMETER
    ``p + raw_update`` (ralamb.py:85-87 clones p then addcdiv's the step
    into it), not over the step alone, and the weight norm is clamped to
    [0, 10]. Weight decay multiplies p by (1 - lr*wd) BEFORE the trusted
    step (ralamb.py:81-82). Emits the full update (lr folded in).
    """

    def init_fn(params):
        return RalambState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params):
        assert params is not None, "ralamb requires params"
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) \
            else learning_rate
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        t = count.astype(jnp.float32)
        beta2_t = b2 ** t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(
            (1.0 - beta2_t) * (n_sma - 4.0) / (n_sma_max - 4.0)
            * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0)
        ) / (1.0 - b1 ** t)
        plain = 1.0 / (1.0 - b1 ** t)
        use_adaptive = n_sma >= 5.0  # ralamb.py:67 uses >= 5, not > thresh
        step_size = jnp.where(use_adaptive, rect, plain)

        def one(p, m, v):
            p_dec = p * (1.0 - lr * weight_decay) if weight_decay > 0 else p
            direction = jnp.where(use_adaptive, m / (jnp.sqrt(v) + eps), m)
            candidate = -step_size * lr * direction
            radam_norm = jnp.linalg.norm(p_dec + candidate)
            weight_norm = jnp.clip(jnp.linalg.norm(p), 0.0, 10.0)
            trust = jnp.where((weight_norm == 0.0) | (radam_norm == 0.0),
                              1.0, weight_norm / radam_norm)
            return (p_dec - p) + trust * candidate

        new_updates = jax.tree_util.tree_map(one, params, mu, nu)
        return new_updates, RalambState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def rangerlars(learning_rate: optax.ScalarOrSchedule,
               alpha: float = 0.5, k: int = 6,
               weight_decay: float = 0.0,
               **ralamb_kw) -> optax.GradientTransformation:
    """Over9000 / RangerLars = Ralamb + Lookahead
    (lib/torch_utils/solver/over9000.py:17-22)."""
    return optax.chain(
        ralamb(learning_rate, weight_decay=weight_decay, **ralamb_kw),
        lookahead(alpha, k))


def ranger_adabelief(learning_rate: optax.ScalarOrSchedule,
                     b1: float = 0.95, b2: float = 0.999,
                     eps: float = 1e-5, alpha: float = 0.5, k: int = 6,
                     n_sma_threshold: float = 5.0,
                     weight_decay: float = 0.0, use_gc: bool = True,
                     gc_conv_only: bool = False
                     ) -> optax.GradientTransformation:
    """Ranger with the AdaBelief second moment
    (lib/torch_utils/solver/ranger_adabelief.py, reachable via
    solver_utils.py:26-31 as OPTIMIZER_CFG type "RangerAdaBelief"):
    GC -> rectified-RAdam-over-residual-variance -> decoupled weight
    decay -> lr -> Lookahead."""
    chain = []
    if use_gc:
        chain.append(centralize_gradients(conv_only=gc_conv_only))
    chain.append(scale_by_radam_rectified(b1, b2, eps, n_sma_threshold,
                                          belief=True))
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    chain.append(lookahead(alpha, k))
    return optax.chain(*chain)
