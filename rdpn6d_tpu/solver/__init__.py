"""Optimizers and LR schedules (counterpart of lib/torch_utils/solver/)."""

from __future__ import annotations

import optax

from ..config import Config
from .projection import adamp, sgdp
from .ranger import (centralize_gradients, lookahead, ralamb, ranger,
                     ranger_adabelief, rangerlars,
                     scale_by_radam_rectified)
from .schedule import flat_and_anneal, warmup_multistep

__all__ = ["ranger", "ranger_adabelief", "lookahead",
           "centralize_gradients", "scale_by_radam_rectified",
           "adamp", "sgdp", "ralamb", "rangerlars",
           "flat_and_anneal", "warmup_multistep",
           "build_optimizer", "build_schedule"]


def build_schedule(cfg: Config, total_iters: int):
    s = cfg.solver
    if s.lr_scheduler == "flat_and_anneal":
        return flat_and_anneal(
            s.base_lr, total_iters, warmup_iters=s.warmup_iters,
            warmup_factor=s.warmup_factor, anneal_point=s.anneal_point,
            anneal_method=s.anneal_method)
    if s.lr_scheduler == "warmup_multistep":
        return warmup_multistep(
            s.base_lr, milestones=(int(total_iters * 2 / 3),
                                   int(total_iters * 8 / 9)),
            warmup_iters=s.warmup_iters, warmup_factor=s.warmup_factor)
    raise ValueError(s.lr_scheduler)


def build_optimizer(cfg: Config, total_iters: int, schedule=None
                    ) -> optax.GradientTransformation:
    """``schedule`` lets the caller share ONE schedule object between the
    optimizer and its logging (so logged lr can never drift from the lr
    actually applied).

    With ``solver.host_lr`` the schedule is NOT baked into the update
    computation: the lr lives in ``opt_state.hyperparams`` (optax
    inject_hyperparams) and the trainer writes ``schedule(it)`` into it
    each iteration from the host. The step program then contains no
    horizon constants at all — changing ``solver.total_epochs`` (or the
    anneal point / warmup length) re-uses the compiled executable from
    the persistent cache instead of triggering a full recompile (~30 min
    for the flagship step through a remote-compile relay). Pinned by
    tests/test_host_lr.py: identical step HLO across horizons, and
    bitwise-identical training vs the baked schedule.
    """
    s = cfg.solver
    if s.host_lr:
        # structure-only factory: the injected scalar replaces the
        # schedule; the trainer drives it (engine/trainer.py)
        return optax.inject_hyperparams(
            lambda learning_rate: _build_opt(cfg, learning_rate))(
                learning_rate=0.0)
    if schedule is None:
        schedule = build_schedule(cfg, total_iters)
    return _build_opt(cfg, schedule)


def _build_opt(cfg: Config, schedule) -> optax.GradientTransformation:
    """Assemble the configured optimizer around ``schedule`` — either a
    callable iteration->lr schedule (baked into the program) or a scalar
    lr hyperparam (solver.host_lr)."""
    s = cfg.solver
    if s.optimizer == "ranger":
        opt = ranger(schedule, weight_decay=s.weight_decay)
    elif s.optimizer == "ranger_adabelief":
        opt = ranger_adabelief(schedule, weight_decay=s.weight_decay)
    elif s.optimizer == "adamp":
        opt = adamp(schedule, weight_decay=s.weight_decay)
    elif s.optimizer == "sgdp":
        opt = sgdp(schedule, weight_decay=s.weight_decay)
    elif s.optimizer == "ralamb":
        opt = ralamb(schedule, weight_decay=s.weight_decay)
    elif s.optimizer in ("rangerlars", "over9000"):
        opt = rangerlars(schedule, weight_decay=s.weight_decay)
    elif s.optimizer == "rmsprop_tf":
        # TF/Caffe2-style RMSprop (rmsprop_tf.py): eps INSIDE the sqrt,
        # square_avg initialized to ONES, alpha=0.9, eps=1e-10. optax's
        # rmsprop defaults to eps_in_sqrt=True already; initial_scale=1
        # gives the TF accumulator init. (The reference applies momentum
        # to lr-scaled steps — lr_in_momentum — which only differs from
        # optax's ordering while the lr schedule is changing.)
        opt = optax.rmsprop(schedule, decay=0.9, eps=1e-10,
                            initial_scale=1.0, momentum=0.9)
    elif s.optimizer == "sgd_gcc":
        # the reference's SGD_GCC: centralize CONV kernels only
        # (sgd_gc.py:252-253 guards dim > 3)
        opt = optax.chain(centralize_gradients(conv_only=True),
                          optax.sgd(schedule, momentum=0.9))
    elif s.optimizer == "adamw":
        opt = optax.adamw(schedule, weight_decay=s.weight_decay)
    elif s.optimizer == "adam":
        opt = optax.adam(schedule)
    elif s.optimizer == "radam":
        opt = optax.chain(
            scale_by_radam_rectified(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(schedule))
    elif s.optimizer == "adabelief":
        opt = optax.adabelief(schedule)
    elif s.optimizer == "lookahead_adam":
        opt = optax.chain(optax.adam(schedule), lookahead())
    elif s.optimizer == "sgd_gc":
        opt = optax.chain(centralize_gradients(),
                          optax.sgd(schedule, momentum=0.9))
    elif s.optimizer == "sgd":
        opt = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(s.optimizer)
    if s.max_grad_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(s.max_grad_norm), opt)
    if cfg.backbone.freeze:
        # the model stop-gradients backbone activations (rdpn.py), so
        # backbone grads are exactly zero — but decoupled weight decay
        # (adamw / ranger's add_decayed_weights) would still shrink the
        # pretrained weights toward zero every step. Mask the whole
        # transformation off for the backbone subtree, matching the torch
        # reference, which excludes requires_grad=False params from the
        # optimizer entirely.
        import jax

        def _trainable(params):
            return {k: jax.tree_util.tree_map(lambda _: k != "backbone", v)
                    for k, v in params.items()}

        opt = optax.masked(opt, _trainable)
    return opt
