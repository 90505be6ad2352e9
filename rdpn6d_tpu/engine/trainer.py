"""Training loop.

Counterpart of the reference's ``GDRN_Lite.do_train`` (engine.py:158-375):
iteration loop over an infinite batched loader (with optional TRAIN2
stochastic mixing), one jitted SPMD step per iteration, periodic writers,
checkpointing and eval — minus the Lightning/DDP scaffolding (the mesh IS
the distribution mechanism).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Iterator

import jax
import numpy as np

from ..config import Config
from ..models import RDPN
from ..parallel import (
    create_mesh,
    create_train_state,
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from ..solver import build_optimizer, build_schedule
from .checkpoint import CheckpointManager
from .writers import ConsoleWriter, JsonWriter, MetricBuffer, TensorboardWriter

logger = logging.getLogger("rdpn6d")


class Trainer:
    def __init__(self, cfg: Config, model: RDPN,
                 variables: dict[str, Any], total_iters: int,
                 mesh=None):
        self.cfg = cfg
        self.model = model
        self.total_iters = total_iters
        self.mesh = mesh if mesh is not None else create_mesh()
        # ONE schedule object drives both the optimizer and the logged lr
        self.schedule = build_schedule(cfg, total_iters)
        self.tx = build_optimizer(cfg, total_iters, schedule=self.schedule)
        # solver.host_lr: the step program carries no schedule — the
        # trainer writes schedule(it) into opt_state.hyperparams each
        # iteration. Evaluate the whole schedule ONCE (vmap handles
        # schedules with cross-step reductions like warmup_multistep's
        # milestone count) and keep it as a host table: per-iter cost is
        # a 4-byte scalar in the donated state, not a device round-trip.
        self._lr_table = None
        if cfg.solver.host_lr:
            import jax.numpy as jnp
            self._lr_table = np.asarray(jax.vmap(self.schedule)(
                jnp.arange(max(total_iters, 1), dtype=jnp.float32)))
        self.state = replicate(
            create_train_state(cfg, variables, self.tx), self.mesh)
        self.step_fn = make_sharded_train_step(cfg, model, self.tx,
                                               self.mesh)
        self._fused_step_fn = None  # built on the first raw grouped batch
        out_dir = cfg.train.output_dir
        # multi-host: only process 0 WRITES metrics/TB to the (shared)
        # output dir (the reference's save_to_disk=is_global_zero,
        # engine.py:218). Checkpoint saves are NOT gated: orbax's
        # CheckpointManager.save/wait_until_finished are collective when
        # jax.process_count()>1 — every process must enter the barrier,
        # and orbax's primary-host logic writes the files once.
        self.is_main = jax.process_index() == 0
        self.ckpt = CheckpointManager(f"{out_dir}/ckpt",
                                      cfg.train.max_to_keep)
        self.buf = MetricBuffer()
        self.console = ConsoleWriter(total_iters)
        self.json_writer = JsonWriter(f"{out_dir}/metrics.json") \
            if self.is_main else None
        self.tb = TensorboardWriter(f"{out_dir}/tb") \
            if self.is_main else None

    def resume(self) -> int:
        self.state, start = self.ckpt.resume_or_load(self.state, resume=True)
        if start:
            logger.info(f"resumed from iteration {start}")
        return start

    def train(self, loader: Iterator[dict], start_iter: int = 0,
              loader2: Iterator[dict] | None = None,
              train2_ratio: float = 0.0,
              eval_fn: Callable[[Any, int], None] | None = None,
              rng: np.random.RandomState | None = None,
              aux_metrics_fn: Callable[[], dict] | None = None) -> Any:
        cfg = self.cfg
        rng = rng or np.random.RandomState(cfg.train.seed)
        ckpt_period = max(int(self.total_iters
                              * cfg.train.checkpoint_period_epochs
                              / max(cfg.solver.total_epochs, 1)), 1)

        prev = None  # (iter, total_loss array) — lag-1 NaN guard
        # getattr: test rigs build partial Trainers via __new__ without
        # running __init__ (tests/test_checkpointing.py)
        lr_table = getattr(self, "_lr_table", None)
        for it in range(start_iter, self.total_iters):
            # TRAIN2 stochastic mixing (engine.py:253-256)
            use2 = loader2 is not None and rng.rand() < train2_ratio
            batch = next(loader2 if use2 else loader)
            if lr_table is not None:
                # solver.host_lr: write this iteration's lr into the
                # injected hyperparam (the scalar rides the donated
                # state; the step program itself is horizon-free)
                opt = self.state.opt_state
                self.state = self.state.replace(opt_state=opt._replace(
                    hyperparams={**opt.hyperparams,
                                 "learning_rate":
                                     np.float32(lr_table[it])}))
            if "rois" in batch:
                # RAW grouped batch (main.device_batches with
                # data.fused_train_step): preprocessing is compiled into
                # the step program — frames replicate, rois shard, and
                # the jit's in_shardings do the placement
                if self._fused_step_fn is None:
                    from ..parallel import make_fused_sharded_train_step

                    self._fused_step_fn = make_fused_sharded_train_step(
                        self.cfg, self.model, self.tx, self.mesh)
                self.state, metrics = self._fused_step_fn(
                    self.state, batch["frames"], batch["rois"],
                    batch["key"])
            else:
                batch = shard_batch(batch, self.mesh)
                self.state, metrics = self.step_fn(self.state, batch)

            # Periodic finiteness guard with one step of lag: step it-1
            # has finished by the time step it is dispatched, so the
            # float() sync is cheap on a direct-attached device, and a
            # NaN can poison at most nan_guard_period optimizer steps
            # before the run stops (the reference asserts every
            # iteration, engine.py:297 — that is the default; through a
            # high-latency relay the blocking readback is a measurable
            # per-iteration tax, see config.train.nan_guard_period)
            if prev is not None \
                    and it % max(cfg.train.nan_guard_period, 1) == 0:
                p_it, p_total = prev
                if not np.isfinite(float(p_total)):
                    raise FloatingPointError(
                        f"non-finite total loss at iter {p_it}")
            prev = (it, metrics.get("total_loss"))

            if (it + 1) % cfg.train.log_period == 0 or it == start_iter:
                host = {k: float(v) for k, v in metrics.items()}
                total = host.get("total_loss", 0.0)
                if not np.isfinite(total):  # engine.py:297 NaN guard
                    raise FloatingPointError(
                        f"non-finite total loss at iter {it}: {host}")
                if aux_metrics_fn is not None:
                    # host-side observability (e.g. DeviceFrameCache
                    # hit/miss/residency) rides the same log event
                    host.update({k: float(v)
                                 for k, v in aux_metrics_fn().items()})
                self.buf.update(host)
                lr = float(lr_table[it]) if lr_table is not None \
                    else float(self.schedule(it))
                self.console.write(it + 1, self.buf, lr)
                if self.json_writer is not None:
                    self.json_writer.write(it + 1, {**host, "lr": lr})
                if self.tb is not None:
                    self.tb.write(it + 1, host)

            if self.tb is not None and cfg.train.tb_histograms \
                    and (it + 1) % (cfg.train.log_period * 10) == 0:
                try:
                    from flax.traverse_util import flatten_dict
                    params = jax.device_get(self.state.params)
                    self.tb.write_histograms(it + 1, {
                        "/".join(path): leaf for path, leaf
                        in flatten_dict(params).items()})
                except Exception:  # observability must never kill training
                    pass

            if self.tb is not None \
                    and (it + 1) % (cfg.train.log_period * 10) == 0:
                # image panels: input rgb / depth-xyz / gt coords / masks
                # (engine.py:331-367's TB visualization)
                try:
                    img = np.asarray(batch["roi_img"][0])
                    panels = {
                        "input_rgb": img[..., :3],
                        "input_depth_xyz": img[..., 3:6],
                    }
                    if "roi_xyz" in batch:
                        panels["gt_coord"] = np.asarray(batch["roi_xyz"][0])
                        panels["gt_mask_visib"] = np.asarray(
                            batch["roi_mask_visib"][0])
                    self.tb.write_images(it + 1, panels)
                except Exception:  # vis must never kill training
                    pass

            if (it + 1) % ckpt_period == 0 or (it + 1) == self.total_iters:
                # force-check THIS step's loss before persisting: the
                # lag-1 guard above has only vetted it-1, so without this
                # sync a NaN landing exactly on a checkpoint iteration
                # (or the final one, never lag-checked) would be saved as
                # the latest state and restored by --resume
                if not np.isfinite(float(metrics.get("total_loss", 0.0))):
                    raise FloatingPointError(
                        f"non-finite total loss at iter {it} — refusing "
                        "to checkpoint the poisoned state")
                prev = None  # already checked; skip the lag-1 re-check
                # all processes call save (collective); device arrays go
                # straight to orbax so multi-host shardings are preserved
                self.ckpt.save(it + 1, self.state)
            if eval_fn is not None and cfg.train.eval_period > 0 \
                    and (it + 1) % cfg.train.eval_period == 0:
                eval_fn(self.state, it + 1)
        # saves are async — commit the final checkpoint before returning
        # (the CLI exits right after; a torn final save would lose it)
        self.ckpt.wait()
        return self.state
