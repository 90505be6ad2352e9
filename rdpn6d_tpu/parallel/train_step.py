"""Jitted SPMD train / eval steps.

Counterpart of the reference's iteration body (engine.py:249-313): forward +
loss + backward + optimizer step + scheduler, but as ONE compiled XLA program
per step. With the batch sharded over the mesh's ``data`` axis and the state
replicated, XLA emits the gradient all-reduce over ICI (the reference's DDP /
NCCL allreduce). Loss reduction for logging rides the same program — no
separate ``comm.reduce_dict`` round (engine.py:300).
"""

from __future__ import annotations


from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..losses import compute_losses
from ..models import RDPN
from ..models.rdpn import _mask_prob


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(cfg: Config, variables: dict[str, Any],
                       tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def _dropblock_kwargs(cfg: Config, step: jax.Array) -> dict[str, Any]:
    """rngs + linear 0->1 ramp over 5000 steps for DropBlock (the
    reference's LinearScheduler, conv_pnp_net.py:67-72)."""
    if cfg.pnp.drop_prob <= 0:
        return {}
    return {
        "rngs": {"dropout": jax.random.fold_in(
            jax.random.PRNGKey(cfg.train.seed + 7), step)},
        "drop_scale": jnp.minimum(step.astype(jnp.float32) / 5000.0, 1.0),
    }


def _make_step_fn(cfg: Config, model: RDPN,
                  tx: optax.GradientTransformation) -> Callable:
    """The ONE train-step body (loss, grads, optimizer update, metrics);
    make_train_step / make_sharded_train_step only differ in how it is
    jitted."""

    def step_fn(state: TrainState, batch: dict[str, jax.Array]):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"],
                **_dropblock_kwargs(cfg, state.step))
            losses = compute_losses(cfg, out, batch)
            total = sum(losses.values())
            return total, (losses, mutated["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step_fn


def make_train_step(cfg: Config, model: RDPN,
                    tx: optax.GradientTransformation) -> Callable:
    """Returns jitted (state, batch) -> (state, metrics)."""
    return jax.jit(_make_step_fn(cfg, model, tx), donate_argnums=(0,))


def make_eval_step(cfg: Config, model: RDPN,
                   use_kabsch: bool | None = None,
                   quant: Any = None) -> Callable:
    """Returns jitted (state, batch) -> pose outputs (R_ego, t, mask, ...).

    With ``use_kabsch`` (or cfg.test.use_pnp + pnp_type ransac_kabsch), the
    net pose seeds an on-device RANSAC-Kabsch geometric refinement over the
    dense correspondences — the TPU replacement for the reference's
    process_net_and_pnp cv2 path (gdrn_evaluator.py:187-314).
    ``quant``: calibrated activation-scale collection for int8 static
    serving (models/quant.calibrate_quant).
    """
    if use_kabsch is None:
        use_kabsch = (cfg.test.use_pnp
                      and cfg.test.pnp_type == "ransac_kabsch")

    def eval_fn(state: TrainState, batch: dict[str, jax.Array]):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if quant is not None:
            variables["quant"] = quant
        out = model.apply(variables, batch, train=False)
        result = {
            "rot_ego": out["rot_ego"],
            "trans": out["trans"],
            # a real PROBABILITY map (model_utils.get_mask_prob semantics):
            # raw logits would make the Kabsch mask threshold select
            # background for CE and the wrong operating point for BCE
            "mask_prob": _mask_prob(out["mask_logits"],
                                    cfg.head.mask_loss)[..., 0],
            "coord": out["coord"],
            "region_logits": out["region_logits"],
        }
        if use_kabsch:
            from ..ops.ransac_kabsch import refine_pose_kabsch

            b = out["coord"].shape[0]
            keys = jax.random.split(jax.random.PRNGKey(0), b)
            depth_xyz = batch["roi_coord_2d"][..., :3]  # head-res scaled xyz
            R_ref, t_ref, ratio = jax.vmap(
                lambda c, rl, mp, dx, rr, fps, ex, rn, tn, k:
                refine_pose_kabsch(c, rl, mp, dx, rr, fps, ex, rn, tn, k,
                                   mask_thr=cfg.head.mask_thr_test))(
                out["coord"], out["region_logits"],
                result["mask_prob"], depth_xyz, batch["resize_ratio"],
                batch["fps"], batch["roi_extent"], out["rot_ego"],
                out["trans"], keys)
            result["rot_ego"] = R_ref
            result["trans"] = t_ref
            result["inlier_ratio"] = ratio
        return result

    return jax.jit(eval_fn)


def make_sharded_train_step(cfg: Config, model: RDPN,
                            tx: optax.GradientTransformation,
                            mesh: Mesh) -> Callable:
    """The same step body jitted with mesh shardings (replicated state,
    data-sharded batch; XLA inserts the gradient all-reduce)."""
    state_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(_make_step_fn(cfg, model, tx),
                   in_shardings=(state_sh, batch_sh),
                   out_shardings=(state_sh, state_sh),
                   donate_argnums=(0,))


def make_fused_sharded_train_step(cfg: Config, model: RDPN,
                                  tx: optax.GradientTransformation,
                                  mesh: Mesh) -> Callable:
    """Grouped preprocessing FUSED into the train step: ONE compiled
    program per iteration, (state, frames, rois, key) -> (state, metrics).

    Why one program instead of preprocess-jit -> train-jit:
    - the jit boundary forces the 6-channel roi_img into the default
      array layout, and the trunk's thin-channel stem conv then pays a
      relayout ``copy`` kernel (~22% of trunk-forward estimated cycles
      at bs=16 in the compiled HLO; tools/bench_layout.py measures the
      same copy directly). Inside one program XLA's layout assignment
      propagates the conv's preferred layout back into the crop/
      backprojection producers — no copy, no boundary.
    - preprocessing itself becomes SPMD: the per-ROI crop/backproject/
      label graph shards over the mesh's data axis with the model,
      instead of running on one device and device-to-device scattering
      the result (shard_batch). Frames are replicated (uint8 full
      frames, a few MB — trivial next to per-ROI activations) so each
      ROI's dynamic frame gather stays device-local.
    - one dispatch per step instead of two.

    The per-ROI GT (xyz crops, packed masks) rides the ROI axis of
    ``rois`` and shards with it. Single-process only: multi-host keeps
    the two-program path (each host holds different frames, so a global
    replicated frames array does not exist).
    """
    from ..data.pipeline import preprocess_rois_grouped

    step_fn = _make_step_fn(cfg, model, tx)

    def fused(state: TrainState, frames: dict[str, jax.Array],
              rois: dict[str, jax.Array], key: jax.Array):
        batch = preprocess_rois_grouped(cfg, frames, rois, key,
                                        train=True)
        return step_fn(state, batch)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(fused,
                   in_shardings=(repl, repl, data, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))
