"""CLI entry: train / eval a config.

Counterpart of the reference's ``core/gdrn_modeling/main_gdrn.py`` +
train/test shell scripts: ``python -m rdpn6d_tpu.main --config-file CFG
[--eval-only] [--resume] [--opts k=v ...]``. No launcher/DDP plumbing — the
device mesh covers all local chips automatically.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="rdpn6d_tpu")
    p.add_argument("--config-file", required=True)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--debug", action="store_true",
                   help="with --eval-only: coordinate-regression debug eval"
                        " (masked coord L1; gdrn_evaluator.py:515-571)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-devices", type=int, default=0,
                   help="0 = all visible devices")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before any "
                        "backend use (multi-host SPMD over DCN). On TPU "
                        "pods the coordinator/process args auto-detect; "
                        "elsewhere pass them explicitly (the reference's "
                        "--num-machines/--machine-rank/--dist-url, "
                        "default_args_setup.py:52-64)")
    p.add_argument("--dist-coordinator", default="",
                   help="coordinator address host:port (with --multihost)")
    p.add_argument("--num-processes", type=int, default=0,
                   help="total process count (with --multihost)")
    p.add_argument("--process-id", type=int, default=-1,
                   help="this process's rank (with --multihost)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace of the "
                        "training loop into <output_dir>/profile "
                        "(view with tensorboard)")
    p.add_argument("--opts", nargs="*", default=[])
    return p.parse_args(argv)


def setup_logging(output_dir: str) -> None:
    os.makedirs(output_dir, exist_ok=True)
    # force=True: jax/absl may have installed root handlers already, which
    # would silently turn basicConfig into a no-op
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(output_dir, "log.txt"))],
        force=True,
    )


def auto_output_dir(config_file: str) -> str:
    """``train.output_dir="auto"`` derives the run dir from the config path
    (reference main_gdrn.py:44-46), including any ``:variant`` suffix:
    ``configs/so.py:tudl/can`` -> ``output/so/tudl/can``."""
    path, _, variant = config_file.partition(":")
    rel = os.path.splitext(path)[0]
    # keep only the part after the last "configs/" (absolute config paths
    # must not escape the output/ prefix), then force it relative
    _, sep, tail = rel.rpartition("configs" + os.sep)
    rel = tail if sep else os.path.basename(rel)
    rel = rel.lstrip(os.sep)
    return os.path.join("output", rel, variant) if variant \
        else os.path.join("output", rel)


def maybe_init_distributed(args) -> None:
    """``--multihost``: bring up the jax distributed runtime so that
    ``jax.devices()`` spans every host and collectives ride DCN.

    Must run before the first backend use. The reference reaches the same
    state through Lightning's DDP spawn (main_gdrn.py:136-163); here every
    host runs the SAME SPMD program over a global mesh instead.
    """
    if not getattr(args, "multihost", False):
        return
    kwargs = {}
    if args.dist_coordinator:
        kwargs["coordinator_address"] = args.dist_coordinator
    if args.num_processes:
        kwargs["num_processes"] = args.num_processes
    if args.process_id >= 0:
        kwargs["process_id"] = args.process_id
    jax.distributed.initialize(**kwargs)
    if jax.process_count() > 1:
        # Establish the cross-host collective context NOW, while every
        # process sits at the same line (skew: milliseconds). The first
        # collective otherwise happens deep inside startup (orbax
        # CheckpointManager's create-directory sync), where per-host
        # skew — records-cache rebuilds, imports, a loaded box — can
        # exceed the transport's hard context-init deadline (observed:
        # CPU gloo's 30 s GetKeyValue limit killing rank 0 while rank 1
        # was still initializing). Contexts are PER DEVICE SET: the
        # process-level barrier covers orbax/gather_predictions-style
        # syncs, and the full-mesh reduce covers the train step's psum
        # (its first execution otherwise lands after per-host compiles,
        # whose skew on a loaded host exceeds the same deadline).
        import numpy as np
        from jax.experimental import multihost_utils
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        multihost_utils.sync_global_devices("rdpn6d:startup")
        devs = np.asarray(jax.devices()).reshape(-1)
        mesh = Mesh(devs, ("d",))
        x = jax.device_put(np.ones((len(devs),), np.float32),
                           NamedSharding(mesh, P("d")))
        total = jax.jit(lambda a: a.sum(),
                        out_shardings=NamedSharding(mesh, P()))(x)
        assert float(total) == float(len(devs))


def main(argv=None):
    args = parse_args(argv)
    maybe_init_distributed(args)
    from .config import load_config
    from .data.loader import train_frame_iterator
    from .data.pipeline import preprocess_batch
    from .engine.trainer import Trainer
    from .models import RDPN, dummy_batch
    from .parallel import create_mesh

    cfg = load_config(args.config_file, args.opts)
    if cfg.train.output_dir == "auto":
        cfg = cfg.apply_opts(
            [f'train.output_dir="{auto_output_dir(args.config_file)}"'])
    setup_logging(cfg.train.output_dir)
    logger = logging.getLogger("rdpn6d")
    cfg.dump(os.path.join(cfg.train.output_dir, "config.json"))
    logger.info(f"devices: {jax.devices()}")

    n_dev = args.num_devices or len(jax.devices())
    if jax.process_count() > 1 and n_dev != len(jax.devices()):
        raise ValueError(
            f"--num-devices={n_dev} on a multi-host run: the mesh would "
            f"take the first {n_dev} of {len(jax.devices())} global "
            "devices and strand whole processes — use every device")
    if cfg.solver.ims_per_batch % n_dev != 0:
        if jax.process_count() > 1:
            # the gcd fallback takes the FIRST n_dev global devices —
            # on a multi-host pod that can leave entire processes
            # without mesh devices (shard_batch div-by-zero, desynced
            # collective checkpoint saves). Sizing the batch is cheap;
            # silently shrinking the pod is not.
            raise ValueError(
                f"ims_per_batch={cfg.solver.ims_per_batch} must be "
                f"divisible by the {n_dev} devices of a multi-host run")
        import math
        n_dev = math.gcd(n_dev, cfg.solver.ims_per_batch)
        logger.warning(
            f"ims_per_batch={cfg.solver.ims_per_batch} not divisible by "
            f"device count; using a {n_dev}-device mesh")
    mesh = create_mesh(n_dev)

    if args.eval_only:
        # eval builds its own model/state from the checkpoint — the
        # training-path init (and pretrained-backbone load) would be
        # discarded work here
        from .engine.eval_runner import coord_regression_eval, run_eval

        for split in cfg.data.test_datasets:
            if args.debug:
                coord_regression_eval(
                    cfg, ckpt_dir=f"{cfg.train.output_dir}/ckpt",
                    split_name=split)
            else:
                run_eval(cfg, ckpt_dir=f"{cfg.train.output_dir}/ckpt",
                         split_name=split)
        return

    model = RDPN(cfg, dtype=jnp.bfloat16 if cfg.solver.amp else jnp.float32)
    variables = model.init(jax.random.PRNGKey(cfg.train.seed),
                           dummy_batch(cfg, 2), train=False)
    if cfg.backbone.pretrained:
        # resolves torchvision://resnetNN against local checkpoint dirs
        # and FAILS LOUDLY if absent (utils/torch_convert.py) — except
        # when resuming an existing run, where the restored checkpoint
        # replaces this init anyway
        from .engine.checkpoint import CheckpointManager
        from .utils.torch_convert import load_pretrained_backbone
        has_ckpt = args.resume and CheckpointManager(
            f"{cfg.train.output_dir}/ckpt",
            cfg.train.max_to_keep).latest_step() is not None
        if not has_ckpt:
            variables = load_pretrained_backbone(
                variables, cfg.backbone.pretrained,
                depth=cfg.backbone.depth)

    # epochs -> iterations (engine.py:179-186 epoch semantics)
    split = list(cfg.data.train_datasets)
    from .data.loader import load_train_records
    n_records = len(load_train_records(
        cfg, split, cache_dir=f"{cfg.train.output_dir}/cache"))
    iters_per_epoch = max(n_records // cfg.solver.ims_per_batch, 1)
    total_iters = iters_per_epoch * cfg.solver.total_epochs
    logger.info(f"{n_records} records, {iters_per_epoch} iters/epoch, "
                f"{total_iters} total iters")

    trainer = Trainer(cfg, model, variables, total_iters, mesh=mesh)
    start = trainer.resume() if args.resume else 0

    key = jax.random.PRNGKey(cfg.train.seed)

    # ims_per_batch is the GLOBAL batch (the reference's detectron2
    # convention): each host's loader yields its 1/process_count share,
    # assembled into one global sharded array by shard_batch
    if cfg.solver.ims_per_batch % jax.process_count() != 0:
        raise ValueError(
            f"ims_per_batch={cfg.solver.ims_per_batch} not divisible by "
            f"process_count={jax.process_count()}")
    bs_local = cfg.solver.ims_per_batch // jax.process_count()
    # distinct per-host PRNG stream for DZI/color-aug draws
    key = jax.random.fold_in(key, jax.process_index())

    # ONE device frame cache shared by the main and TRAIN2 loaders (keys
    # are rgb paths — globally unique): two caches would pin up to
    # 2x device_frame_cache_mb of HBM with no shared accounting
    dev_cache = None
    if cfg.data.grouped_train and cfg.data.device_frame_cache_mb > 0:
        from .data.device_cache import DeviceFrameCache

        dev_cache = DeviceFrameCache(cfg.data.device_frame_cache_mb << 20)

    def device_batches(split_name: str, seed: int = 0):
        nonlocal key
        if cfg.data.grouped_train:
            # frame-deduplicated compact-dtype path: uint8/uint16 frames
            # cross host->device once per image, GT rides the ROI axis in
            # f16/packed-uint8 (4-5x less step input than the flat path)
            from .data.loader import train_group_iterator
            from .data.pipeline import preprocess_rois_grouped

            # single process + fused_train_step: hand the trainer RAW
            # (frames, rois, key) — preprocessing compiles INTO the
            # train step (parallel.make_fused_sharded_train_step: no
            # jit-boundary relayout copy, preprocess shards with the
            # model, one dispatch/step). Multi-host keeps the
            # two-program path: each host holds different frames, so
            # the fused program's replicated frames array doesn't exist.
            fused = cfg.data.fused_train_step and jax.process_count() == 1
            for gb in train_group_iterator(
                    cfg, split_name, seed=seed, batch_size=bs_local,
                    cache_dir=f"{cfg.train.output_dir}/cache",
                    frame_bucket=cfg.data.frame_bucket,
                    yield_keys=dev_cache is not None):
                key, sub = jax.random.split(key)
                if dev_cache is not None:
                    frames = dev_cache.stack(gb["frame_slots"])
                else:
                    frames = {k: jnp.asarray(v)
                              for k, v in gb["frames"].items()}
                rois = {k: jnp.asarray(v) for k, v in gb["rois"].items()}
                if fused:
                    yield {"frames": frames, "rois": rois, "key": sub}
                else:
                    yield preprocess_rois_grouped(cfg, frames, rois, sub,
                                                  train=True)
            return
        for frames in train_frame_iterator(
                cfg, split_name, seed=seed, batch_size=bs_local,
                cache_dir=f"{cfg.train.output_dir}/cache"):
            key, sub = jax.random.split(key)
            batch = preprocess_batch(
                cfg, {k: jnp.asarray(v) for k, v in frames.items()}, sub,
                train=True)
            yield batch

    # TRAIN2 stochastic mixing (engine.py:253-256)
    loader2 = None
    if cfg.data.train2_datasets and cfg.data.train2_ratio > 0:
        loader2 = device_batches(list(cfg.data.train2_datasets), seed=1)

    # periodic eval during training (engine.py:316-322)
    eval_fn = None
    if cfg.train.eval_period > 0 and cfg.data.test_datasets:
        from .engine.eval_runner import run_eval

        def eval_fn(state, it):
            for test_split in cfg.data.test_datasets:
                run_eval(cfg, ckpt_dir="", split_name=test_split,
                         state=state, model=model)

    if args.profile:
        from .utils.profiling import trace

        with trace(os.path.join(cfg.train.output_dir, "profile")):
            trainer.train(device_batches(split), start_iter=start,
                          loader2=loader2,
                          train2_ratio=cfg.data.train2_ratio,
                          eval_fn=eval_fn,
                          aux_metrics_fn=dev_cache.stats
                          if dev_cache is not None else None)
    else:
        trainer.train(device_batches(split), start_iter=start,
                      loader2=loader2, train2_ratio=cfg.data.train2_ratio,
                      eval_fn=eval_fn,
                      aux_metrics_fn=dev_cache.stats
                      if dev_cache is not None else None)
    logger.info("training complete")


if __name__ == "__main__":
    main()
