"""Projection optimizers (AdamP/SGDP), RangerAdaBelief, SGD_GCC.

Counterpart tests for the reference's lib/torch_utils/solver/{adamp,sgdp,
ranger_adabelief,sgd_gc}.py. The AdamP/SGDP checks compare the jitted
optax transforms against independent numpy step-by-step replicas of the
published algorithms (Heo et al. 2020) on multi-step trajectories.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdpn6d_tpu.solver import adamp, ranger, ranger_adabelief, sgdp
from rdpn6d_tpu.solver.projection import project_scale_invariant
from rdpn6d_tpu.solver.ranger import centralize_gradients


# ---------------------------------------------------------------- replicas


def _np_cos_rows(a, b, rows, eps):
    a2 = a.reshape(rows, -1)
    b2 = b.reshape(rows, -1)
    dot = (a2 * b2).sum(1)
    den = np.maximum(np.linalg.norm(a2, axis=1) * np.linalg.norm(b2, axis=1),
                     eps)
    return np.abs(dot / den)


def _np_project(p, g, u, delta, wd_ratio, eps):
    """The two-view cascade, straight from the paper's Alg. 1."""
    if p.ndim <= 1:
        return u, 1.0
    for rows in (p.shape[0], 1):
        cols = p.size // rows
        if _np_cos_rows(g, p, rows, eps).max() < delta / math.sqrt(cols):
            p2 = p.reshape(rows, -1)
            u2 = u.reshape(rows, -1)
            pn = p2 / (np.linalg.norm(p2, axis=1, keepdims=True) + eps)
            u2 = u2 - pn * (pn * u2).sum(1, keepdims=True)
            return u2.reshape(u.shape), wd_ratio
    return u, 1.0


def _np_adamp_run(p0, grads, lr, b1=0.9, b2=0.999, eps=1e-8, wd=0.0,
                  delta=0.1, wd_ratio=0.1, nesterov=False):
    p = p0.copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        denom = np.sqrt(v) / math.sqrt(1 - b2 ** t) + eps
        perturb = ((b1 * m + (1 - b1) * g) / denom) if nesterov \
            else m / denom
        perturb, wdr = _np_project(p, g, perturb, delta, wd_ratio, eps)
        if wd > 0:
            p = p * (1 - lr * wd * wdr)
        p = p - (lr / (1 - b1 ** t)) * perturb
    return p


def _np_sgdp_run(p0, grads, lr, momentum=0.9, dampening=0.0, wd=0.0,
                 nesterov=False, eps=1e-8, delta=0.1, wd_ratio=0.1):
    p = p0.copy()
    buf = np.zeros_like(p)
    for g in grads:
        buf = momentum * buf + (1 - dampening) * g
        d_p = g + momentum * buf if nesterov else buf
        d_p, wdr = _np_project(p, g, d_p, delta, wd_ratio, eps)
        if wd > 0:
            p = p * (1 - lr * wd * wdr / (1 - momentum))
        p = p - lr * d_p
    return p


def _run_optax(tx, p0, grads):
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)

    @jax.jit
    def step(params, state, g):
        upd, state = tx.update({"w": g}, state, params)
        return jax.tree_util.tree_map(lambda p, u: p + u, params, upd), state

    for g in grads:
        params, state = step(params, state, jnp.asarray(g))
    return np.asarray(params["w"])


# ------------------------------------------------------------------- tests


def _trajectory(rng, shape, n=12):
    """Gradients alternating between radial (aligned with p) and
    tangential so BOTH projection branches fire along the run."""
    return [rng.standard_normal(shape).astype(np.float32) for _ in range(n)]


@pytest.mark.parametrize("nesterov", [False, True])
def test_adamp_matches_numpy_replica(nesterov):
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 6)).astype(np.float32)
    grads = _trajectory(rng, (4, 6))
    # make some steps near-orthogonal to p so projection fires
    for i in range(0, len(grads), 3):
        g = grads[i].reshape(-1)
        pf = p0.reshape(-1)
        g -= pf * (g @ pf) / (pf @ pf)
        grads[i] = 1e-3 * g.reshape(p0.shape)  # tiny tangential step
    want = _np_adamp_run(p0, grads, lr=1e-2, wd=0.05, nesterov=nesterov)
    got = _run_optax(
        adamp(1e-2, weight_decay=0.05, nesterov=nesterov), p0, grads)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("nesterov", [False, True])
def test_sgdp_matches_numpy_replica(nesterov):
    rng = np.random.default_rng(1)
    p0 = rng.standard_normal((3, 5)).astype(np.float32)
    grads = _trajectory(rng, (3, 5))
    want = _np_sgdp_run(p0, grads, lr=5e-3, wd=0.05, nesterov=nesterov)
    got = _run_optax(
        sgdp(5e-3, weight_decay=0.05, nesterov=nesterov), p0, grads)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_projection_removes_radial_component():
    """A tangential gradient on a scale-invariant weight must yield an
    update orthogonal to the weight (the whole point of AdamP)."""
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    u = rng.standard_normal((2, 8)).astype(np.float32)
    # gradient exactly orthogonal to p row-wise -> channel view fires
    g = u - np.asarray(p) * (u * np.asarray(p)).sum(1, keepdims=True) \
        / (np.asarray(p) ** 2).sum(1, keepdims=True)
    new_u, projected = project_scale_invariant(
        p, jnp.asarray(g), jnp.asarray(u), delta=0.1, eps=1e-8)
    assert bool(projected)
    dots = np.abs((np.asarray(new_u) * np.asarray(p)).sum(1))
    np.testing.assert_allclose(dots, 0.0, atol=1e-4)


def test_projection_passthrough_for_aligned_grad_and_vectors():
    p = jnp.ones((2, 8))
    g = 3.0 * p  # perfectly radial: cosine = 1 >> delta/sqrt(n)
    u = jnp.full((2, 8), 0.5)
    new_u, projected = project_scale_invariant(p, g, u, 0.1, 1e-8)
    assert not bool(projected)
    np.testing.assert_allclose(np.asarray(new_u), np.asarray(u))
    # 1-D params never project
    new_u, projected = project_scale_invariant(
        jnp.ones(5), jnp.zeros(5), jnp.ones(5), 0.1, 1e-8)
    assert not bool(projected)


def test_ranger_adabelief_differs_only_via_variance():
    """With a CONSTANT gradient the residual (g - mu)^2 shrinks toward
    zero, so post-warmup AdaBelief steps are LARGER than Ranger's; both
    descend the same direction."""
    p0 = np.full((2, 4), 2.0, np.float32)
    g = np.full((2, 4), 0.0, np.float32)
    g[0, :] = 0.3  # non-uniform so GC doesn't zero it entirely
    grads = [g] * 30
    end_r = _run_optax(ranger(1e-2, k=10 ** 9), p0, grads)
    end_b = _run_optax(ranger_adabelief(1e-2, k=10 ** 9), p0, grads)
    # both moved, belief moved further (same sign)
    assert not np.allclose(end_r, p0)
    d_r = np.abs(p0 - end_r).sum()
    d_b = np.abs(p0 - end_b).sum()
    assert d_b > d_r


def _np_ralamb_run(p0, grads, lr, b1=0.9, b2=0.999, eps=1e-8, wd=0.0):
    """Independent replica of the over9000-lineage Ralamb step."""
    p = p0.copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    n_sma_max = 2 / (1 - b2) - 1
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        beta2_t = b2 ** t
        n_sma = n_sma_max - 2 * t * beta2_t / (1 - beta2_t)
        if n_sma >= 5:
            step = math.sqrt((1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                             * (n_sma - 2) / n_sma
                             * n_sma_max / (n_sma_max - 2)) / (1 - b1 ** t)
            direction = m / (np.sqrt(v) + eps)
        else:
            step = 1.0 / (1 - b1 ** t)
            direction = m
        weight_norm = min(np.linalg.norm(p), 10.0)
        p_dec = p * (1 - lr * wd) if wd > 0 else p
        candidate = -step * lr * direction
        radam_norm = np.linalg.norm(p_dec + candidate)
        trust = 1.0 if (weight_norm == 0 or radam_norm == 0) \
            else weight_norm / radam_norm
        p = p_dec + trust * candidate
    return p


def test_ralamb_matches_numpy_replica():
    from rdpn6d_tpu.solver import ralamb

    rng = np.random.default_rng(7)
    p0 = rng.standard_normal((4, 5)).astype(np.float32)
    grads = _trajectory(rng, (4, 5), n=10)
    want = _np_ralamb_run(p0, grads, lr=1e-2, wd=0.05)
    got = _run_optax(ralamb(1e-2, weight_decay=0.05), p0, grads)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_gc_conv_only_skips_dense_kernels():
    gc = centralize_gradients(conv_only=True)
    state = gc.init(None)
    conv_g = jnp.asarray(
        np.random.default_rng(3).standard_normal((3, 3, 4, 8)),
        jnp.float32)
    dense_g = jnp.asarray(
        np.random.default_rng(4).standard_normal((16, 8)), jnp.float32)
    out, _ = gc.update({"c": conv_g, "d": dense_g}, state)
    # conv kernel centralized over all-but-output axes
    np.testing.assert_allclose(
        np.asarray(out["c"]).mean(axis=(0, 1, 2)), 0.0, atol=1e-6)
    # dense kernel untouched (ndim <= 3)
    np.testing.assert_allclose(np.asarray(out["d"]), np.asarray(dense_g))


@pytest.mark.parametrize(
    "name", ["ranger_adabelief", "adamp", "sgdp", "sgd_gcc",
             "ralamb", "rangerlars", "over9000", "rmsprop_tf"])
def test_build_optimizer_new_names_step(name):
    from rdpn6d_tpu.config import Config
    from rdpn6d_tpu.solver import build_optimizer

    cfg = Config().apply_opts([f"solver.optimizer={name}",
                               "solver.base_lr=1e-3"])
    tx = build_optimizer(cfg, total_iters=10)
    params = {"head": {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}}
    state = tx.init(params)
    # non-uniform so gradient centralization can't zero it out
    grads = jax.tree_util.tree_map(
        lambda p: 0.1 * jnp.arange(p.size, dtype=p.dtype).reshape(p.shape),
        params)
    upd, _ = tx.update(grads, state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree_util.tree_leaves(new))
    # it actually moved (warmup makes the first step tiny — check exact)
    assert bool(jnp.any(new["head"]["w"] != params["head"]["w"]))
