"""On-device preprocessing graph: frame -> training-ready ROI tensors.

THE key TPU-first translation (SURVEY.md §7 step 4). The reference does all
of this per-sample in python dataloader workers — cv2.warpAffine crops,
numpy back-projection, scipy cdist region labels
(core/gdrn_modeling/data_loader.py:338-1022). Here the whole chain is ONE
jitted, vmapped-over-ROIs XLA program:

    DZI bbox jitter -> square crop (bilinear/nearest gathers)
    -> pixel normalize -> depth / resize_ratio -> back-project with the
    crop-composed intrinsics (data_loader.py:744-763's newCameraK = A @ K)
    -> 2D coord map -> masks -> xyz -> region + rotated-residual labels
    (data_loader.py:881-903) -> pose targets (trans_ratio,
    data_loader.py:1005-1010).

Host workers only decode PNGs and stack fixed-shape frame tensors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..geometry import ego_to_allo_mat, mat_to_ortho6d
from ..ops.binning import quantize_coords
from ..ops.region import residual_coord_target
from ..ops.warp import crop_affine, crop_resize_mm


def dzi_jitter(key: jax.Array, bbox_xyxy: jax.Array, im_hw: tuple[int, int],
               dzi_type: str = "uniform", pad_scale: float = 1.5,
               scale_ratio: float = 0.25, shift_ratio: float = 0.25,
               enable: bool = True) -> tuple[jax.Array, jax.Array]:
    """Dynamic-zoom-in box jitter (base_data_loader.py:120-152; uniform
    and roi10d modes).

    bbox_xyxy [4] -> (center [2], scale []). ``enable=False`` gives the
    deterministic test-time box (center, max-side * pad_scale).
    """
    x1, y1, x2, y2 = bbox_xyxy[0], bbox_xyxy[1], bbox_xyxy[2], bbox_xyxy[3]
    cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    bw, bh = x2 - x1, y2 - y1
    side = jnp.maximum(bh, bw)
    if enable and dzi_type == "uniform":
        r = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
        s = (1.0 + scale_ratio * r[0])
        center = jnp.stack([cx + bw * shift_ratio * r[1],
                            cy + bh * shift_ratio * r[2]])
        scale = side * s * pad_scale
    elif enable and dzi_type == "roi10d":
        # shift each corner by +-15% of the box side
        # (base_data_loader.py:131-145)
        r = jax.random.uniform(key, (4,), minval=-0.15, maxval=0.15)
        nx1 = jnp.clip(x1 + bw * r[0], 0.0, float(im_hw[1]))
        nx2 = jnp.clip(x2 + bw * r[1], 0.0, float(im_hw[1]))
        ny1 = jnp.clip(y1 + bh * r[2], 0.0, float(im_hw[0]))
        ny2 = jnp.clip(y2 + bh * r[3], 0.0, float(im_hw[0]))
        center = jnp.stack([0.5 * (nx1 + nx2), 0.5 * (ny1 + ny2)])
        scale = jnp.maximum(ny2 - ny1, nx2 - nx1) * pad_scale
    elif enable and dzi_type not in ("none", ""):
        # the reference raises on truncnorm too (base_data_loader.py:146);
        # dzi_type is a static string, so this raises at trace time
        raise NotImplementedError(f"DZI type {dzi_type!r} not implemented "
                                  "(use uniform | roi10d | none)")
    else:
        center = jnp.stack([cx, cy])
        scale = side * pad_scale
    # clamp: frame-size above, >=1 px below (a degenerate detection box
    # must not produce scale=0 -> inf resize_ratio -> NaN poses)
    scale = jnp.clip(scale, 1.0, float(max(im_hw)))
    return center, scale


def coord_2d_map(height: int, width: int) -> jax.Array:
    """Full-frame normalized 2D coordinate map [H, W, 2] in [0, 1]
    (core/utils/data_utils.py get_2d_coord_np)."""
    x = jnp.linspace(0.0, 1.0, width)
    y = jnp.linspace(0.0, 1.0, height)
    xx, yy = jnp.meshgrid(x, y)
    return jnp.stack([xx, yy], axis=-1)


def _backproject_crop(depth_crop: jax.Array, K: jax.Array,
                      center: jax.Array, scale: jax.Array,
                      input_res: int, out_res: int) -> jax.Array:
    """depth crop [S, S] -> camera-frame XYZ [S, S, 3] via the crop-warped
    intrinsics, with the reference's depth /= resize_ratio convention
    (data_loader.py:753-763)."""
    from ..geometry.camera import backproject_depth, crop_K

    Kc = crop_K(K, crop_affine(center, scale, input_res))
    resize_ratio = out_res / scale
    return backproject_depth(depth_crop / resize_ratio, Kc)


@partial(jax.jit, static_argnames=("cfg", "train"))
def preprocess_roi(cfg: Config, sample: dict[str, jax.Array],
                   key: jax.Array, train: bool = True
                   ) -> dict[str, jax.Array]:
    """One ROI's full preprocessing. All inputs are full-frame tensors:

    sample: rgb [H,W,3] (0..255), depth [H,W] (m), K [3,3], bbox [4],
            xyz [H,W,3] (model-frame GT map; train), mask_visib [H,W],
            gt_rot [3,3], gt_trans [3], fps [K,3], extent [3],
            centroid_2d [2].
    vmap over a leading batch axis for many ROIs.
    """
    d = cfg.data
    input_res, out_res = d.input_res, d.out_res
    H, W = sample["rgb"].shape[0], sample["rgb"].shape[1]

    # compact-dtype inputs (the frame-deduplicated train/eval path ships
    # uint8 RGB and raw uint16 depth + factor to cut host->device bytes
    # 4x; the reference collates everything as float32 per ROI,
    # engine_utils.py:6-63) — cast on device, where HBM bandwidth is cheap
    rgb_full = sample["rgb"].astype(jnp.float32)
    if "depth_raw" in sample:
        depth_full = sample["depth_raw"].astype(jnp.float32) \
            / sample["depth_factor"]
    else:
        depth_full = sample["depth"]

    # independent streams per consumer — a key must never be both used
    # and re-split
    k_dzi, k_aug, k_on = jax.random.split(key, 3)
    center, scale = dzi_jitter(
        k_dzi, sample["bbox"], (H, W), d.dzi_type, d.dzi_pad_scale,
        d.dzi_scale_ratio, d.dzi_shift_ratio, enable=train)
    bw = jnp.maximum(sample["bbox"][2] - sample["bbox"][0], 1.0)
    bh = jnp.maximum(sample["bbox"][3] - sample["bbox"][1], 1.0)
    resize_ratio = out_res / scale

    # RGB crop + color aug + pixel normalization -----------------------
    # (matmul resampling: 16x faster than gathers on TPU, see ops/warp.py)
    rgb = crop_resize_mm(rgb_full, center, scale, input_res)
    if train and d.color_aug_prob > 0:
        from .augment import color_augment, get_aug_pipeline

        ops = d.color_aug_ops or get_aug_pipeline(d.color_aug_type)
        if ops:
            aug = color_augment(rgb, k_aug, ops)
            rgb = jnp.where(jax.random.bernoulli(k_on, d.color_aug_prob),
                            aug, rgb)
    mean = jnp.asarray(d.pixel_mean)
    std = jnp.asarray(d.pixel_std)
    rgb = (rgb - mean) / std

    # depth crop -> camera-frame XYZ (full-precision resample: bf16 MXU
    # rounding would cost millimeters) -----------------------------------
    depth_crop = crop_resize_mm(depth_full, center, scale, input_res,
                                precision="highest")
    depth_xyz = _backproject_crop(depth_crop, sample["K"], center, scale,
                                  input_res, out_res)

    roi_img = jnp.concatenate([rgb, depth_xyz], axis=-1)  # [256,256,6]

    # 5-channel coord feature at out_res (data_loader.py:832-836) ------
    coord2d = crop_resize_mm(coord_2d_map(H, W), center, scale, out_res,
                             precision="highest")
    stride = input_res // out_res
    roi_coord_2d = jnp.concatenate(
        [depth_xyz[::stride, ::stride, :], coord2d], axis=-1)

    out = {
        "roi_img": roi_img,
        "roi_coord_2d": roi_coord_2d,
        "roi_cam": sample["K"],
        "bbox_center": center,
        "scale": scale,
        "roi_wh": jnp.stack([bw, bh]),
        "resize_ratio": resize_ratio,
        "fps": sample["fps"],
        "roi_extent": sample["extent"],
    }
    # pass through per-class loss assets when the host attached them
    for k in ("roi_points", "sym_rots", "roi_cls"):
        if k in sample:
            out[k] = sample[k]
    if not train:
        return out

    # masks: the compact path ships ONE uint8 plane per ROI with visib in
    # bit 0 and trunc in bit 1 instead of two float32 full frames
    if "mask_packed" in sample:
        packed = sample["mask_packed"]
        mask_visib_in = (packed & 1).astype(jnp.float32)
        mask_trunc_in = ((packed >> 1) & 1).astype(jnp.float32)
        has_trunc = True
    else:
        mask_visib_in = sample["mask_visib"]
        mask_trunc_in = sample.get("mask_trunc")
        has_trunc = mask_trunc_in is not None

    # masks + xyz (nearest, data_loader.py:846-866): ONE stacked crop —
    # separate crop_resize calls each rebuild the coordinate grid and
    # issue an independent gather over the full frame, and XLA does not
    # dedupe them
    if "xyz" in sample:
        xyz_full = sample["xyz"].astype(jnp.float32)
        mask_obj = ((xyz_full[..., 0] != 0) | (xyz_full[..., 1] != 0)
                    | (xyz_full[..., 2] != 0)).astype(jnp.float32)
        mask_visib = mask_visib_in * mask_obj
        planes = [mask_visib[..., None], mask_obj[..., None], xyz_full]
        if has_trunc:  # host truncation aug (loader)
            planes.append((mask_trunc_in * mask_obj)[..., None])
        # crop-shipped GT (loader ship_crops): xyz/mask_packed arrive as
        # the xyz map's nonzero bbox + offset — shift the warp's source
        # coordinates into crop space; out-of-crop taps read zero exactly
        # like the full frame's zeros outside that bbox
        gt_center = center if "xyz_offset" not in sample \
            else center - sample["xyz_offset"]
        stacked = crop_resize_mm(jnp.concatenate(planes, axis=-1),
                                 gt_center, scale, out_res,
                                 precision="highest", interp="nearest")
        roi_mask_visib = stacked[..., 0]
        roi_mask_obj = stacked[..., 1]
        roi_xyz_raw = stacked[..., 2:5]
        roi_mask_trunc = stacked[..., 5] if has_trunc else roi_mask_visib
    else:
        # no GT xyz map shipped: derive model-frame coords from the depth
        # surface ON DEVICE, at out_res, AFTER the nearest crop. The
        # nearest crop picks one source pixel (u, v) per output pixel, so
        # back-projecting the cropped (depth, u, v) planes with the
        # original K and applying xyz = R^T (p_cam - t) equals nearest-
        # cropping a host-precomputed full-frame xyz map (loader.py's
        # depth fallback) — without the [H,W,3] float32 ever crossing
        # host->device (the largest per-ROI tensor in a train batch).
        uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                              jnp.arange(H, dtype=jnp.float32))
        planes = [mask_visib_in[..., None], depth_full[..., None],
                  uu[..., None], vv[..., None]]
        if has_trunc:
            planes.append(mask_trunc_in[..., None])
        stacked = crop_resize_mm(jnp.concatenate(planes, axis=-1), center,
                                 scale, out_res, precision="highest",
                                 interp="nearest")
        visib_c, depth_c = stacked[..., 0], stacked[..., 1]
        u_c, v_c = stacked[..., 2], stacked[..., 3]
        Kf, t_gt = sample["K"], sample["gt_trans"]
        m = (depth_c > 1e-6).astype(jnp.float32) * visib_c
        pc = jnp.stack([(u_c - Kf[0, 2]) * depth_c / Kf[0, 0],
                        (v_c - Kf[1, 2]) * depth_c / Kf[1, 1],
                        depth_c], axis=-1)
        roi_xyz_raw = jnp.einsum(
            "hwj,jk->hwk", pc - t_gt, sample["gt_rot"]) * m[..., None]
        roi_mask_obj = m          # visible surface only (no amodal render)
        roi_mask_visib = m
        roi_mask_trunc = stacked[..., 4] * m if has_trunc else m
    if cfg.head.coord_residual:
        # RDPN: region + GT-rotated FPS residual (data_loader.py:874-903)
        region, coord = residual_coord_target(
            roi_xyz_raw, sample["fps"], sample["gt_rot"], sample["extent"])
    else:
        # GDR-Net absolute mode: plain extent-normalized model coords
        from ..ops.region import xyz_to_region

        region, _ = xyz_to_region(roi_xyz_raw, sample["fps"])
        coord = roi_xyz_raw / sample["extent"][None, None, :] + 0.5

    # pose targets (data_loader.py:946-1010) ---------------------------
    t = sample["gt_trans"]
    delta_c = sample["centroid_2d"] - center
    trans_ratio = jnp.stack(
        [delta_c[0] / bw, delta_c[1] / bh, t[2] / resize_ratio])
    rot_allo = ego_to_allo_mat(t[None], sample["gt_rot"][None])[0]

    out.update({
        "roi_mask_trunc": roi_mask_trunc,
        "roi_mask_visib": roi_mask_visib,
        "roi_mask_obj": roi_mask_obj,
        "roi_xyz": coord,
        "roi_region": region,
        "gt_rot": sample["gt_rot"],
        "gt_trans": t,
        "trans_ratio": trans_ratio,
        "gt_allo_rot6d": mat_to_ortho6d(rot_allo),
    })
    if cfg.head.xyz_loss == "CE_coor":
        masks = {"trunc": roi_mask_trunc, "visib": roi_mask_visib,
                 "obj": roi_mask_obj}
        out["roi_xyz_bin"] = quantize_coords(
            coord, masks[cfg.head.xyz_loss_mask], cfg.head.xyz_bin)
    return out


def preprocess_batch(cfg: Config, samples: dict[str, jax.Array],
                     key: jax.Array, train: bool = True
                     ) -> dict[str, jax.Array]:
    """vmapped preprocessing over a leading ROI-batch axis."""
    n = samples["rgb"].shape[0]
    keys = jax.random.split(key, n)
    return jax.vmap(
        lambda s, k: preprocess_roi(cfg, s, k, train))(samples, keys)


_FRAME_KEYS = ("rgb", "depth", "depth_raw", "depth_factor", "K",
               "xyz", "mask_visib", "mask_trunc")


def preprocess_rois_grouped(cfg: Config, frames: dict[str, jax.Array],
                            rois: dict[str, jax.Array], key: jax.Array,
                            train: bool = False) -> dict[str, jax.Array]:
    """Frame-deduplicated preprocessing: many ROIs share few frames.

    frames: full-frame tensors with a FRAME axis ([F,H,W,3] rgb — uint8
    welcome, [F,H,W] depth (or depth_raw uint16 + depth_factor [F]),
    [F,3,3] K); rois: per-ROI tensors ([B] frame_idx int32 plus
    bbox/fps/extent/...). Each ROI's crop reads its frame by dynamic index
    inside the vmapped graph — frames cross host->device ONCE instead of
    once per ROI (test images carry ~5 instances on YCB-V; the reference
    pays the copy per ROI in its collate, engine_utils.py:66-99).

    Train batches additionally carry per-ROI GT on the ROI axis in compact
    dtypes: ``xyz`` [B,H,W,3] float16 (or omitted to derive coords from
    the depth surface on device) and ``mask_packed`` [B,H,W] uint8 (visib
    bit 0, trunc bit 1) — see ``loader.RecordDecoder.decode_compact``.
    """
    if train and any(k in frames for k in ("xyz", "mask_visib",
                                           "mask_trunc")):
        # per-INSTANCE GT maps cannot live on the shared frame axis: two
        # ROIs of different objects in one frame would silently share one
        # instance's xyz/mask targets. Train batches must keep GT maps
        # per ROI (the ROI axis of `rois`, or preprocess_batch).
        raise ValueError(
            "preprocess_rois_grouped(train=True) with per-instance GT "
            "maps on the frame axis; pass GT maps per ROI instead")
    n = rois["frame_idx"].shape[0]
    keys = jax.random.split(key, n)

    def one(roi, k):
        idx = roi["frame_idx"]
        sample = dict(roi)
        sample.pop("frame_idx")
        for fk in _FRAME_KEYS:
            if fk in frames:
                sample[fk] = frames[fk][idx]
        return preprocess_roi(cfg, sample, k, train)

    return jax.vmap(one)(rois, keys)
