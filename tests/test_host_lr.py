"""solver.host_lr: horizon-invariant train programs.

With host_lr the lr is an opt-state hyperparam (optax inject_hyperparams)
written by the trainer from a host-side schedule table each iteration, so
the compiled step contains NO schedule constants: changing
solver.total_epochs / warmup / anneal_point re-uses the cached executable
instead of recompiling (~30 min for the flagship step through a
remote-compile relay). These tests pin (1) identical update-program HLO
across horizons, (2) bitwise-identical optimization vs the baked
schedule, (3) the negative control — the baked path's HLO DOES change
with the horizon (the reason this knob exists).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rdpn6d_tpu.config import Config
from rdpn6d_tpu.solver import build_optimizer, build_schedule


def _params():
    k = jax.random.PRNGKey(0)
    return {"w": jax.random.normal(k, (8, 8)), "b": jnp.zeros((8,))}


def _grads(i):
    k = jax.random.PRNGKey(100 + i)
    return {"w": jax.random.normal(k, (8, 8)) * 0.1,
            "b": jax.random.normal(jax.random.fold_in(k, 1), (8,)) * 0.1}


def _update_hlo(cfg, total_iters):
    tx = build_optimizer(cfg, total_iters)
    params = _params()
    state = tx.init(params)
    return jax.jit(tx.update).lower(_grads(0), state, params).as_text()


def test_update_hlo_invariant_across_horizons():
    cfg = Config().apply_opts(["solver.host_lr=true"])
    assert _update_hlo(cfg, 100) == _update_hlo(cfg, 3700)


def test_baked_hlo_depends_on_horizon():
    """Negative control: without host_lr the schedule constants (anneal
    start / total iters) are baked into the program, so the horizon IS
    a recompile trigger."""
    cfg = Config().apply_opts(["solver.warmup_iters=10"])
    assert _update_hlo(cfg, 100) != _update_hlo(cfg, 3700)


def test_host_lr_matches_baked_schedule_bitwise():
    """Driving the injected lr with schedule(it) from the host reproduces
    the baked scale_by_schedule run exactly — same multiply, same order,
    for both a plain chain (adamw) and the lookahead-wrapped ranger."""
    for opt_name in ("adamw", "ranger"):
        base = [f'solver.optimizer="{opt_name}"', "solver.warmup_iters=3",
                "solver.weight_decay=0.01"]
        total = 12
        cfg_b = Config().apply_opts(base)
        cfg_h = Config().apply_opts(base + ["solver.host_lr=true"])
        sched = build_schedule(cfg_b, total)

        tx_b = build_optimizer(cfg_b, total)
        tx_h = build_optimizer(cfg_h, total)
        p_b = _params()
        p_h = _params()
        s_b = tx_b.init(p_b)
        s_h = tx_h.init(p_h)
        lr_table = np.asarray(jax.vmap(sched)(
            jnp.arange(total, dtype=jnp.float32)))

        for i in range(6):
            g = _grads(i)
            u_b, s_b = tx_b.update(g, s_b, p_b)
            s_h = s_h._replace(hyperparams={
                **s_h.hyperparams,
                "learning_rate": np.float32(lr_table[i])})
            u_h, s_h = tx_h.update(g, s_h, p_h)
            import optax
            p_b = optax.apply_updates(p_b, u_b)
            p_h = optax.apply_updates(p_h, u_h)
        for k in p_b:
            np.testing.assert_array_equal(np.asarray(p_b[k]),
                                          np.asarray(p_h[k]),
                                          err_msg=f"{opt_name}/{k}")


def test_trainer_lr_table_matches_schedule():
    """The trainer's vmapped one-shot table equals per-step schedule
    evaluation, including a schedule with a cross-milestone reduction
    (warmup_multistep's gamma ** sum(step >= milestones))."""
    cfg = Config().apply_opts(['solver.lr_scheduler="warmup_multistep"',
                               "solver.warmup_iters=5"])
    total = 30
    sched = build_schedule(cfg, total)
    table = np.asarray(jax.vmap(sched)(
        jnp.arange(total, dtype=jnp.float32)))
    per_step = np.asarray([float(sched(i)) for i in range(total)])
    np.testing.assert_allclose(table, per_step, rtol=1e-6)
