"""LR schedules.

Counterpart of the reference's ``flat_and_anneal_lr_scheduler``
(lib/torch_utils/solver/lr_scheduler.py:177-264): linear warmup -> flat until
``anneal_point`` of training -> cosine/linear/poly/exp anneal; plus standard
warmup-multistep. Implemented as optax schedules (iteration -> lr factor).
"""

from __future__ import annotations

import jax.numpy as jnp


def flat_and_anneal(
    base_lr: float,
    total_iters: int,
    warmup_iters: int = 0,
    warmup_factor: float = 0.001,
    anneal_point: float = 0.72,
    anneal_method: str = "cosine",
    target_lr_factor: float = 0.0,
    poly_power: float = 1.0,
):
    """Returns an optax-compatible schedule fn: step -> lr."""
    if not 0.0 <= anneal_point <= 1.0:
        # the reference validates too (lr_scheduler.py:216-218); out of
        # range the anneal would silently never (or instantly) start
        raise ValueError(f"anneal_point must be in [0, 1], "
                         f"got {anneal_point}")
    anneal_start = anneal_point * total_iters

    def schedule(step):
        x = jnp.asarray(step, jnp.float32)
        # warmup factor
        alpha = jnp.clip(x / jnp.maximum(warmup_iters, 1), 0.0, 1.0)
        wf = warmup_factor * (1 - alpha) + alpha
        # anneal factor
        frac = jnp.clip((x - anneal_start)
                        / jnp.maximum(total_iters - anneal_start, 1.0),
                        0.0, 1.0)
        if anneal_method == "cosine":
            af = target_lr_factor + 0.5 * (1 - target_lr_factor) * (
                1 + jnp.cos(jnp.pi * frac))
        elif anneal_method == "linear":
            af = target_lr_factor + (1 - target_lr_factor) * (1 - frac)
        elif anneal_method == "poly":
            af = target_lr_factor + (1 - target_lr_factor) * (
                (1 - frac) ** poly_power)
        elif anneal_method == "exp":
            tl = max(target_lr_factor, 5e-3)
            af = tl ** frac
        elif anneal_method == "none":
            af = jnp.ones_like(frac)
        else:
            raise ValueError(anneal_method)
        factor = jnp.where(x < warmup_iters, wf,
                           jnp.where(x >= anneal_start, af, 1.0))
        return base_lr * factor

    return schedule


def warmup_multistep(base_lr: float, milestones: tuple[int, ...],
                     gamma: float = 0.1, warmup_iters: int = 1000,
                     warmup_factor: float = 0.001):
    ms = jnp.asarray(milestones, jnp.float32)

    def schedule(step):
        x = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(x / jnp.maximum(warmup_iters, 1), 0.0, 1.0)
        wf = warmup_factor * (1 - alpha) + alpha
        decay = gamma ** jnp.sum(x >= ms)
        return base_lr * wf * decay

    return schedule
