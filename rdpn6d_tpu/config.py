"""Typed configuration system.

Replaces the reference's mmcv ``Config.fromfile`` python-dict configs with
``_base_`` inheritance and stringified-``eval`` fields
(core/gdrn_modeling/main_gdrn.py:39-65, a quirk SURVEY.md flags to not
replicate). Here configs are plain frozen-ish dataclasses: composable in
python config modules (configs/*.py expose ``get_config()``), overridable
from the CLI with dotted ``key=value`` opts, and serializable to JSON for
output-dir dumps.
"""

from __future__ import annotations

import dataclasses
import importlib.util
import json
import os
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class BackboneConfig:
    depth: int = 34                 # 18/34/50/101/152
    input_res: int = 256
    rgb_channels: int = 3           # trunk consumes RGB; depth-XYZ feeds fusion
    freeze: bool = False
    rot_concat: bool = False        # multi-scale skip fusion into the head
    pretrained: str = ""            # path to converted torchvision npz, or ""
    space_to_depth: bool = False    # exact s2d(2)+4x4/s1 stem rewrite (the
    # 15-20%-MFU thin-stem remedy, PERF.md round 4; param tree changes
    # shape but converts losslessly — models/resnet.py:stem_kernel_to_s2d)


@dataclass(frozen=True)
class HeadConfig:
    num_filters: int = 256
    num_layers: int = 3
    out_res: int = 64
    norm: str = "BN"                # BN | GN
    gn_groups: int = 32
    num_classes: int = 13
    num_regions: int = 32
    coord_residual: bool = True     # RDPN rotated FPS-residual coords;
    # False = GDR-Net absolute normalized coords (PnP-decodable w/o R)
    xyz_loss: str = "L1"            # L1 | CE_coor
    xyz_bin: int = 64
    xyz_loss_mask: str = "visib"    # trunc | visib | obj
    xyz_lw: float = 1.0
    mask_loss: str = "L1"           # L1 | BCE | CE
    mask_loss_gt: str = "trunc"
    mask_lw: float = 1.0
    mask_thr_test: float = 0.5
    region_loss_mask: str = "visib"
    region_lw: float = 1.0
    rot_class_aware: bool = False
    mask_class_aware: bool = False
    region_class_aware: bool = False
    # weight init for the dense head AND the PnP net:
    #  "reference" = CDPN tiny normal(std=0.001) everywhere (the
    #    reference's deliberate choice, cdpn_rot_head_region.py:140-146,
    #    conv_pnp_net.py:104-113) — right for full-length training runs;
    #  "fan_in" = flax lecun_normal — converges ~10x faster on short
    #    horizons (overfit gates, mini-BOP rehearsals), where tiny init
    #    leaves gradients too small to learn rotation in a few hundred
    #    iterations
    init: str = "reference"         # reference | fan_in

    @property
    def coord_dim(self) -> int:
        return 3 * (self.xyz_bin + 1) if self.xyz_loss == "CE_coor" else 3

    @property
    def mask_dim(self) -> int:
        return 2 if self.mask_loss == "CE" else 1

    @property
    def region_dim(self) -> int:
        return self.num_regions + 1


@dataclass(frozen=True)
class PnPConfig:
    featdim: int = 128
    num_layers: int = 3
    norm: str = "GN"
    gn_groups: int = 32
    drop_prob: float = 0.0
    rot_type: str = "allo_rot6d"    # {allo,ego}_{rot6d,quat}
    trans_type: str = "centroid_z"
    z_type: str = "REL"
    with_2d_coord: bool = True      # concat [depth_xyz/4 ; 2d coords] (5 ch)
    region_attention: bool = True
    mask_attention: str = "mul"     # none | mul | concat
    pnp_head: str = "ConvPnPNet"    # ConvPnPNet | SimplePointPnP | PointPnP
    r_only: bool = False            # translation from TransHead instead

    @property
    def rot_dim(self) -> int:
        if "rot6d" in self.rot_type:
            return 6
        if "lie_vec" in self.rot_type:
            return 3
        return 4  # quat / log_quat

    @property
    def is_allo(self) -> bool:
        return self.rot_type.startswith("allo")


@dataclass(frozen=True)
class LossConfig:
    pm_lw: float = 1.0
    pm_loss_type: str = "L1"
    pm_norm_by_extent: bool = True
    pm_r_only: bool = True
    pm_loss_sym: bool = False
    pm_smooth_l1_beta: float = 1.0
    pm_disentangle_t: bool = False   # PM_DISENTANGLE_T (R/T split)
    pm_disentangle_z: bool = False   # PM_DISENTANGLE_Z (R/xy/z split)
    pm_t_use_points: bool = False    # PM_T_USE_POINTS
    num_pm_points: int = 3000
    centroid_loss: str = "L1"
    centroid_lw: float = 1.0
    z_loss: str = "L1"
    z_lw: float = 1.0
    rot_lw: float = 0.0
    rot_loss_type: str = "angular"
    trans_lw: float = 0.0           # direct translation loss
    trans_loss_disentangle: bool = True
    bind_lw: float = 0.0            # R^T t binding term (gdrn_base.py:101)
    use_mtl: bool = False           # uncertainty multi-task weighting


@dataclass(frozen=True)
class DataConfig:
    dzi_type: str = "uniform"       # uniform | roi10d | none
    dzi_pad_scale: float = 1.5
    dzi_scale_ratio: float = 0.25
    dzi_shift_ratio: float = 0.25
    input_res: int = 256
    out_res: int = 64
    pixel_mean: tuple[float, float, float] = (0.0, 0.0, 0.0)
    pixel_std: tuple[float, float, float] = (255.0, 255.0, 255.0)
    color_aug_prob: float = 0.0
    color_aug_type: str = "aae"     # code | aae | aae_weak | lm | roi10d
    # | none — named pipeline families (reference COLOR_AUG_TYPE,
    # base_data_loader.py:154-239)
    color_aug_ops: tuple = ()       # custom AugOp tuple (python configs
    # only); overrides color_aug_type when non-empty
    change_bg_prob: float = 0.0
    bg_images_dir: str = ""         # VOC/SUN-style background pool
    truncate_fg: bool = False
    filter_visib_thr: float = 0.0
    repeat_factor_thresh: float = 0.0   # >0: RepeatFactorSampler
    grouped_train: bool = True      # frame-deduplicated compact-dtype
    # train input path (uint8 RGB / uint16 depth on a shared frame axis,
    # f16 xyz + packed uint8 masks per ROI; loader.train_group_iterator).
    # The production default: 6.8x measured at the real CLI (PERF.md).
    # Samples per FRAME instead of per instance (detectron2-style
    # per-image sampling, like the reference); repeat_factor_thresh>0
    # applies the reference-exact IMAGE-level repeat factors here.
    # false = legacy flat per-instance path (float32 full frames per ROI).
    frame_bucket: int = 8           # frame-axis pad bucket (grouped path)
    fused_train_step: bool = False  # grouped path, single process: fuse
    # preprocessing into the train step — ONE compiled program per
    # iteration, sharding the per-ROI preprocess graph over the mesh
    # with the model. The HLO cost model predicted the fusion would
    # kill a jit-boundary relayout copy (tools/bench_layout), but the
    # real-chip A/B (tools/bench_train --grouped-ab, PERF.md round 4)
    # measured the fused program 1.5-5% SLOWER than the two-program
    # pipeline at 95/190 ROIs — so the two-program path is the default
    # and the fused step stays as a tested opt-in (it remains the
    # sharded-preprocess option for mesh runs whose host input feed is
    # the bottleneck). Multi-host always uses the two-program path
    # (frames differ per host).
    ship_crops: bool = True         # grouped path: ship per-ROI GT xyz +
    # packed masks as TIGHT CROPS (the xyz map's own nonzero bbox) with a
    # [2] offset instead of full frames — bit-exact (everything the train
    # graph consumes is zero outside that bbox: masks are multiplied by
    # mask_obj = xyz-nonzero on device), and it cuts the dominant
    # host->device train bytes ~4-5x on 480x640 frames. false = full-frame
    # GT maps (debug fallback).
    crop_pad: int = 64              # crop-side pad bucket (few jit shapes)
    # bytes-capped LRU of raw decoded frames (uint8 rgb + stored-dtype
    # depth, ~1.5 MB per 480x640 frame): multi-epoch training over
    # small/medium splits stops re-paying the PNG decode ceiling
    # (~53 frames/s/core) every epoch. Augmentation draws happen AFTER
    # the cache (per-visit re-roll untouched). 0 disables.
    frame_cache_mb: int = 2048
    # DEVICE-resident frame LRU (data/device_cache.py): decoded frames
    # stay in HBM keyed by source path, so multi-epoch training re-ships
    # only frames evicted or bg-replaced — on a link-thin host the frame
    # bytes are THE grouped-path step bottleneck (PERF.md round 4).
    # ~1.5 MB/frame at 480x640: 1024 MB holds ~700 frames. 0 disables
    # (e.g. to free HBM for very large batches).
    device_frame_cache_mb: int = 1024
    train_datasets: tuple[str, ...] = ()
    train2_datasets: tuple[str, ...] = ()
    train2_ratio: float = 0.0
    test_datasets: tuple[str, ...] = ()
    det_files_test: tuple[str, ...] = ()
    # top-k score-sorted detections kept per (image, object class);
    # candidates are assigned to distinct GT instances by IoU, so a
    # high cap only matters on duplicate-instance images (icbin/tless).
    # The reference sets DET_TOPK_PER_OBJ=100 in essentially every
    # shipped config (all *SO/ + flagship; dataset_utils.py:178-181)
    det_topk_per_obj: int = 100


@dataclass(frozen=True)
class SolverConfig:
    ims_per_batch: int = 24
    total_epochs: int = 25
    optimizer: str = "ranger"       # ranger | ranger_adabelief | adamw | adam |
                                    # radam | adabelief | adamp | sgdp |
                                    # ralamb | rangerlars/over9000 | rmsprop_tf |
                                    # lookahead_adam | sgd | sgd_gc | sgd_gcc
    base_lr: float = 1e-4
    weight_decay: float = 0.0
    lr_scheduler: str = "flat_and_anneal"
    anneal_method: str = "cosine"
    anneal_point: float = 0.72
    warmup_iters: int = 1000
    warmup_factor: float = 0.001
    max_grad_norm: float = 0.0      # 0 = off
    host_lr: bool = False           # lr as an opt-state hyperparam written
                                    # by the trainer each iter instead of a
                                    # schedule baked into the step program:
                                    # the compiled step becomes invariant to
                                    # total_epochs/warmup/anneal changes
                                    # (persistent-cache hit instead of a
                                    # full recompile). Changes the opt_state
                                    # pytree — checkpoints are not
                                    # interchangeable with host_lr=false.
    amp: bool = True                # bf16 compute
    remat: bool = False             # rematerialize trunk+head activations
    # in the backward pass (jax.checkpoint): trades ~30% extra FLOPs for
    # roughly half the activation memory — enables larger train batches


@dataclass(frozen=True)
class TrainRuntimeConfig:
    checkpoint_period_epochs: float = 5.0
    max_to_keep: int = 5
    log_period: int = 100
    eval_period: int = 0
    seed: int = 0
    output_dir: str = "output"
    tb_histograms: bool = False     # parameter histograms to TB at
    # 10x log_period (my_writer.py:200-266's histogram_raw support);
    # opt-in: it fetches the full param tree to host at that cadence
    nan_guard_period: int = 1       # check loss finiteness every N iters
    # (lag-1). 1 = the reference's every-iteration assert (engine.py:297).
    # Through a high-latency device relay each check costs a ~25 ms
    # blocking readback; N>1 trades "a NaN can poison at most N optimizer
    # steps before the run stops" for that per-iteration tax. Checkpoint
    # saves ALWAYS force-check regardless (trainer.py), so a poisoned
    # state can never be persisted.


@dataclass(frozen=True)
class TestConfig:
    use_pnp: bool = False
    pnp_type: str = "ransac_kabsch"  # ransac_kabsch | net
    test_bbox_type: str = "gt"       # gt | est
    error_types: str = "ad,adi,AUCad,re,te,proj"
    eval_precision: bool = False
    plots: bool = True              # dump recall-vs-threshold curve CSVs
    # (+PNGs when matplotlib exists) next to the BOP CSV — the
    # counterpart of the reference's lib/pysixd/eval_plots.py
    int8_static: Any = False         # False | True | "per_channel":
    # calibrated static activation scales — calibrate on the first eval
    # batch, then serve with compile-time requant scales (no dynamic
    # absmax reductions). Measured 1.16x FASTER than bf16 at head
    # granularity (PERF.md round 3); dynamic mode measured slower.
    # "per_channel" calibrates one scale per input channel, absorbed
    # into the weights (models/quant.py Int8Conv) — for trunk modes
    # where per-tensor scales lose rotation accuracy.
    int8: str = ""                   # "" | head | trunk | all — W8A8
    # serving mode (models/quant.py); "head" preserves accuracy (see
    # PERF.md), but bf16 measured faster on v5e — experimental opt-in


@dataclass(frozen=True)
class Config:
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    head: HeadConfig = field(default_factory=HeadConfig)
    pnp: PnPConfig = field(default_factory=PnPConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    train: TrainRuntimeConfig = field(default_factory=TrainRuntimeConfig)
    test: TestConfig = field(default_factory=TestConfig)
    exp_name: str = "rdpn6d"

    # ------------------------------------------------------------------
    def replace(self, **sections) -> "Config":
        return dataclasses.replace(self, **sections)

    def apply_opts(self, opts: list[str]) -> "Config":
        """CLI dotted overrides: ``solver.base_lr=3e-4 head.num_regions=16``."""
        cfg = self
        for opt in opts:
            key, sep, raw = opt.partition("=")
            if not sep:
                # a dropped "=value" would otherwise silently assign ""
                # (e.g. "solver.amp" turning amp falsy with no diagnostic)
                raise ValueError(f"malformed opt {opt!r}: expected "
                                 "section.key=value")
            parts = key.strip().split(".")
            try:
                value = json.loads(raw)
            except json.JSONDecodeError:
                value = raw
                if value in ("True", "False"):
                    # Python-style BARE-WORD bools: json.loads only
                    # accepts lowercase, and a fall-through string
                    # "False" is TRUTHY — a silent flag inversion a CLI
                    # user would never notice. An explicitly quoted
                    # '"True"' json-parses above and stays a string.
                    value = value == "True"
            if isinstance(value, list):  # keep configs hashable (jit static)
                value = tuple(value)
            if len(parts) == 1:
                cfg = dataclasses.replace(cfg, **{parts[0]: value})
            elif len(parts) == 2:
                section = dataclasses.replace(
                    getattr(cfg, parts[0]), **{parts[1]: value})
                cfg = dataclasses.replace(cfg, **{parts[0]: section})
            else:
                raise ValueError(f"opt key too deep: {key}")
        return cfg

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)


def load_config(path: str, opts: list[str] | None = None) -> Config:
    """Load a python config module exposing ``get_config() -> Config``.

    Parametric configs take a variant suffix after ``:`` —
    ``configs/so.py:tudl/can`` calls ``get_config("tudl/can")``. This
    replaces the reference's per-object config-file families
    (configs/gdrn/*SO/, one copy-pasted file per object) with one
    parametric module.
    """
    variant = None
    if ":" in path and not os.path.exists(path):
        path, _, variant = path.rpartition(":")
    spec = importlib.util.spec_from_file_location("exp_config", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if variant is not None:
        cfg = mod.get_config(variant)
    else:
        cfg = mod.get_config()
    if opts:
        cfg = cfg.apply_opts(opts)
    return cfg
