"""Host-side data loading: decode, batch, prefetch; device does the rest.

Counterpart of the reference's torch DataLoader + GDRN_DatasetFromList
(data_loader.py:1046-1159) but inverted: the host ONLY decodes PNGs and
stacks fixed-shape frame tensors; every geometric/label transform runs in
the jitted on-device pipeline (data/pipeline.py). Prefetching overlaps host
decode with device compute via a background thread.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Iterator

import numpy as np

from ..config import Config
from .bop import build_split_records, get_split
from .refs import get_ref
from .assets import ClassAssets
from .sampler import InfiniteSampler, RepeatFactorSampler


class SkipRecord(Exception):
    """Raised by the decoder for records that cannot produce a training
    sample (fully-occluded instance, empty mask): the loader skips them
    like unreadable files (the reference's _rand_another)."""


class _BytesLRU:
    """Bytes-capped thread-safe LRU of decoded frames.

    PNG decode is the measured host ceiling of the input path (PERF.md:
    ~53 frames/s/core); on multi-epoch training over small/medium splits
    the same frames are re-decoded every epoch. Caching the RAW decoded
    arrays (pre-augmentation: background replacement, truncation and
    color aug re-roll per visit AFTER the cache, so augmentation
    diversity is untouched) removes that work from epoch 2 on. Cached
    arrays are marked read-only — every downstream consumer copies
    (astype / np.where / np.stack)."""

    def __init__(self, cap_bytes: int):
        from collections import OrderedDict
        import threading

        self.cap = cap_bytes
        self._d: "OrderedDict[str, Any]" = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()

    @staticmethod
    def _nbytes(val) -> int:
        if isinstance(val, dict):
            return sum(v.nbytes for v in val.values()
                       if isinstance(v, np.ndarray))
        return val.nbytes

    def get(self, key: str, decode):
        with self._lock:
            if key in self._d:
                self._d.move_to_end(key)
                return self._d[key]
        val = decode()  # decode OUTSIDE the lock: epoch-1 stays parallel
        arrs = val.values() if isinstance(val, dict) else (val,)
        for a in arrs:
            if isinstance(a, np.ndarray):
                a.flags.writeable = False
        with self._lock:
            if key not in self._d:
                self._d[key] = val
                self._bytes += self._nbytes(val)
                while self._bytes > self.cap and len(self._d) > 1:
                    _, old = self._d.popitem(last=False)
                    self._bytes -= self._nbytes(old)
        return val


def _imread_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)


def _imread_depth(path: str, depth_factor: float) -> np.ndarray:
    import cv2

    d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if d is None:
        raise FileNotFoundError(path)
    return d.astype(np.float32) / depth_factor


def _imread_mask(path: str) -> np.ndarray:
    import cv2

    m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    return (m > 0).astype(np.float32) if m is not None else None


class RecordDecoder:
    """record dict -> full-frame numpy sample for the device pipeline."""

    def __init__(self, cfg: Config, assets: "ClassAssets",
                 num_pm_points: int | None = None,
                 train: bool = True, seed: int = 0):
        self.cfg = cfg
        self.assets = assets
        self.num_pm_points = num_pm_points or cfg.loss.num_pm_points
        self.train = train
        self.seed = seed
        # legacy shared stream (kept for _random_bg file choice when no
        # per-record rng is threaded); augmentation draws use _record_rng
        self.rng = np.random.RandomState(seed)
        self._bg_files: list[str] | None = None
        cap_mb = int(getattr(cfg.data, "frame_cache_mb", 0))
        self._frame_cache = _BytesLRU(cap_mb << 20) if cap_mb > 0 else None

    def _decoded_frame(self, rec: dict[str, Any]) -> dict[str, np.ndarray]:
        """Raw decoded (rgb uint8, depth as-stored) for a record, through
        the bytes-capped LRU when enabled. Pre-augmentation by design."""
        import cv2

        def decode():
            bgr = cv2.imread(rec["rgb_path"], cv2.IMREAD_COLOR)
            if bgr is None:
                raise FileNotFoundError(rec["rgb_path"])
            draw = cv2.imread(rec["depth_path"], cv2.IMREAD_UNCHANGED)
            if draw is None:
                raise FileNotFoundError(rec["depth_path"])
            return {"rgb": cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB),
                    "depth_stored": draw}

        if self._frame_cache is None:
            return decode()
        return self._frame_cache.get(rec["rgb_path"], decode)

    def _record_rng(self, rec: dict[str, Any],
                    visit: int = 0) -> np.random.RandomState:
        """Deterministic per-(record, visit) stream: reproducible regardless
        of decode-thread interleaving (the shared RandomState would make
        change_bg/truncate draws depend on thread scheduling), while the
        visit counter re-rolls augmentation on every epoch pass — matching
        the reference, which draws fresh randomness per __getitem__ visit
        (base_data_loader.py:320-364)."""
        mix = (self.seed * 1_000_003
               + int(rec.get("scene_id", 0)) * 10_007
               + int(rec.get("im_id", 0)) * 101
               + int(rec.get("inst_idx", 0))
               + int(visit) * 97_002_121) & 0x7FFFFFFF
        return np.random.RandomState(mix)

    def _random_bg(self, H: int, W: int,
                   rng: np.random.RandomState | None = None
                   ) -> np.ndarray | None:
        """Random background image (uint8 RGB) from cfg.data.bg_images_dir
        (VOC/SUN replacement pool, base_data_loader.py:320-364)."""
        import glob
        import os

        d = self.cfg.data.bg_images_dir
        if not d:
            return None
        if self._bg_files is None:
            self._bg_files = sorted(
                glob.glob(os.path.join(d, "**", "*.jpg"), recursive=True)
                + glob.glob(os.path.join(d, "**", "*.png"), recursive=True))
        if not self._bg_files:
            return None
        import cv2

        path = self._bg_files[(rng or self.rng).randint(
            len(self._bg_files))]
        bg = cv2.imread(path, cv2.IMREAD_COLOR)
        if bg is None:
            return None
        bg = cv2.cvtColor(bg, cv2.COLOR_BGR2RGB)
        return cv2.resize(bg, (W, H))

    @staticmethod
    def _depth_fallback_xyz(depth: np.ndarray, rec: dict[str, Any],
                            mask_visib: np.ndarray | None) -> np.ndarray:
        """Model-frame coords of the VISIBLE surface from measured depth:
        xyz = R^T (backproject(depth) - t), zeroed outside
        (depth valid) & mask. The single definition both the flat and the
        grouped decode paths regress against when no xyz crop is on disk.
        """
        H, W = depth.shape
        K, R, t = rec["K"], rec["R"], rec["t"]
        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        pc = np.stack([(u - K[0, 2]) * depth / K[0, 0],
                       (v - K[1, 2]) * depth / K[1, 1], depth], -1)
        xyz = (pc - t) @ R  # = R^T (p - t)
        m = depth > 1e-6
        if mask_visib is not None:
            m = m & (mask_visib > 0)
        return xyz * m[..., None]

    def _mask_visib(self, rec: dict[str, Any]) -> np.ndarray | None:
        """Visible-object mask from mask file or YCB-style label image.
        The binary mask / raw label image ride the frame LRU keyed by
        path alone (one cached label image serves every instance of a
        YCB-style frame); read failures are never cached, so a transient
        error cannot pin the depth-fallback mask for the rest of the run.
        A fresh float32 copy is returned per call, so callers may write
        into it."""
        cache = self._frame_cache

        mpath = rec.get("mask_visib_path")
        if mpath:
            def load_m() -> np.ndarray:
                m = _imread_mask(mpath)
                if m is None:
                    raise FileNotFoundError(mpath)
                return m.astype(np.uint8)

            try:
                m8 = load_m() if cache is None \
                    else cache.get(("mask", mpath), load_m)
            except FileNotFoundError:
                m8 = None
            if m8 is not None:
                return m8.astype(np.float32)

        lpath = rec.get("label_path")
        if lpath:
            import cv2

            def load_lab() -> np.ndarray:
                lab = cv2.imread(lpath, cv2.IMREAD_UNCHANGED)
                if lab is None:
                    raise FileNotFoundError(lpath)
                return lab

            try:
                lab = load_lab() if cache is None \
                    else cache.get(("label", lpath), load_lab)
            except FileNotFoundError:
                return None
            return (lab == rec["label_obj_id"]).astype(np.float32)
        return None

    def _xyz_info(self, path: str) -> dict[str, np.ndarray]:
        """xyz_crop pkl contents (crop + inclusive xyxy box, stored
        dtype), riding the frame LRU."""
        def load() -> dict[str, np.ndarray]:
            import pickle

            with open(path, "rb") as f:
                info = pickle.load(f)
            return {"xyxy": np.asarray(info["xyxy"], np.int32),
                    "crop": np.asarray(info["xyz_crop"])}

        return load() if self._frame_cache is None \
            else self._frame_cache.get(("xyz", path), load)

    def _xyz_full(self, path: str, H: int, W: int) -> np.ndarray:
        """xyz_crop pkl pasted into a fresh float32 full-frame map."""
        info = self._xyz_info(path)
        x1, y1, x2, y2 = (int(v) for v in info["xyxy"])
        full = np.zeros((H, W, 3), np.float32)
        full[y1:y2 + 1, x1:x2 + 1] = info["crop"].astype(np.float32)
        return full

    def _bbox_xyxy(self, rec: dict[str, Any],
                   mask_visib: np.ndarray | None) -> np.ndarray:
        bbox = rec.get("bbox_visib")
        if bbox is None:
            if mask_visib is None:
                raise SkipRecord(f"no bbox and no mask: {rec['rgb_path']}")
            ys, xs = np.nonzero(mask_visib)
            if xs.size == 0:  # fully occluded / invalid depth everywhere
                raise SkipRecord(
                    f"empty visibility mask: {rec['rgb_path']}")
            return np.array([xs.min(), ys.min(), xs.max(), ys.max()],
                            np.float32)
        bbox = np.asarray(bbox, np.float32)
        if bbox.shape[0] == 4 and rec.get("bbox_mode", "xywh") == "xywh":
            bbox = np.array([bbox[0], bbox[1], bbox[0] + bbox[2],
                             bbox[1] + bbox[3]], np.float32)
        return bbox

    def _roi_assets(self, rec: dict[str, Any]) -> dict[str, np.ndarray]:
        proj = rec["K"] @ rec["t"]
        a = self.assets.for_obj(rec["obj_id"])
        return {
            "K": rec["K"].astype(np.float32),
            "gt_rot": rec["R"].astype(np.float32),
            "gt_trans": rec["t"].astype(np.float32),
            "fps": a["fps"].astype(np.float32),
            "extent": a["extent"].astype(np.float32),
            "centroid_2d": (proj[:2] / proj[2]).astype(np.float32),
            "roi_points": a["points"][:self.num_pm_points].astype(
                np.float32),
            "sym_rots": a["sym_rots"].astype(np.float32),
            "roi_cls": np.int32(rec["cls_idx"]),
        }

    def read_frame(self, rec: dict[str, Any]) -> dict[str, np.ndarray]:
        """Decode ONE frame's shared tensors in compact dtypes: uint8 RGB,
        raw uint16 depth + factor, K. Decoded once per (scene, im) by the
        grouped train path — the reference decodes and collates the frame
        once PER INSTANCE (engine_utils.py:6-63), a 4-5x host decode +
        PCIe waste on multi-instance datasets."""
        base = self._decoded_frame(rec)
        draw = base["depth_stored"]
        if draw.dtype != np.uint16:
            draw = draw.astype(np.uint16)
        return {
            "rgb": base["rgb"],  # uint8 (read-only when cached; every
                                 # consumer copies: np.where/astype/stack)
            "depth_raw": draw,
            "depth_factor": np.float32(rec["depth_factor"]),
            "K": rec["K"].astype(np.float32),
        }

    def decode_roi_compact(
        self, rec: dict[str, Any], frame: dict[str, np.ndarray],
        visit: int = 0, ship_xyz: bool = True,
    ) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray] | None]:
        """One instance's compact per-ROI tensors against a shared frame.

        Returns (roi, private_frame): ``roi`` carries the GT the device
        pipeline needs on the ROI axis — ``mask_packed`` uint8 (visib bit
        0, trunc bit 1), optional ``xyz`` float16 (omitted when
        ``ship_xyz=False``: the device derives coords from the depth
        surface), bbox + pose + per-class assets. ``private_frame`` is a
        composited copy of the frame when background-replacement aug fired
        for THIS instance (the reference composites per instance sample,
        base_data_loader.py:320-364) — the caller gives such ROIs their
        own frame slot; all other instances keep sharing the original.
        """
        H, W = rec["height"], rec["width"]
        mask_visib = self._mask_visib(rec)

        # ship_crops: GT xyz (and the packed masks) leave the host as the
        # xyz map's own nonzero bbox + a [2] offset instead of full
        # frames. Bit-exact: the device graph multiplies every consumed
        # mask by mask_obj = xyz-nonzero, which is zero outside this box,
        # and out-of-crop warp taps are zero like the full frame's zeros
        # (pipeline.preprocess_roi, ops/warp.crop_resize). ~4-5x less
        # per-ROI train bytes at 480x640.
        ship_crops = bool(getattr(self.cfg.data, "ship_crops", False))
        xyz16 = None
        xyz_box = None  # inclusive (x1, y1, x2, y2) covering xyz != 0
        if ship_xyz:
            if rec.get("xyz_path") and os.path.exists(rec["xyz_path"]):
                info = self._xyz_info(rec["xyz_path"])
                x1, y1, x2, y2 = (int(v) for v in info["xyxy"])
                xyz_box = (x1, y1, x2, y2)
                if ship_crops:
                    xyz16 = np.ascontiguousarray(
                        info["crop"].astype(np.float16))
                else:
                    xyz16 = self._xyz_full(
                        rec["xyz_path"], H, W).astype(np.float16)
                if mask_visib is None:
                    mask_visib = np.zeros((H, W), np.float32)
                    mask_visib[y1:y2 + 1, x1:x2 + 1] = (
                        np.abs(info["crop"].astype(np.float32)).sum(-1)
                        > 0)
            else:
                depth = frame["depth_raw"].astype(np.float32) \
                    / float(frame["depth_factor"])
                xyz16 = self._depth_fallback_xyz(
                    depth, rec, mask_visib).astype(np.float16)
                if mask_visib is None:
                    mask_visib = (np.abs(xyz16.astype(np.float32)).sum(-1)
                                  > 0).astype(np.float32)
                if ship_crops:
                    # float compare, NOT a bit test: the masked multiply
                    # leaves -0.0 at background pixels, which is exactly
                    # mask_obj == 0 on device (xyz != 0 is False for -0.0)
                    nz = xyz16 != 0
                    nz_y = np.flatnonzero(np.any(nz, axis=(1, 2)))
                    nz_x = np.flatnonzero(np.any(nz, axis=(0, 2)))
                    if nz_y.size:
                        xyz_box = (int(nz_x[0]), int(nz_y[0]),
                                   int(nz_x[-1]), int(nz_y[-1]))
                    else:  # fully occluded/invalid: 1px zero crop
                        xyz_box = (0, 0, 0, 0)
                    x1, y1, x2, y2 = xyz_box
                    xyz16 = np.ascontiguousarray(
                        xyz16[y1:y2 + 1, x1:x2 + 1])
        if mask_visib is None:
            # maskless dataset with ship_xyz=False: same semantics as the
            # flat path's depth fallback (visible surface = valid-depth
            # pixels, cropped to the ROI downstream). A SkipRecord here
            # would starve train_group_iterator into a silent infinite
            # spin — the flat path trains fine on the same data.
            mask_visib = (frame["depth_raw"] > 0).astype(np.float32)

        bbox = self._bbox_xyxy(rec, mask_visib)

        mask_trunc = mask_visib
        private = None
        d = self.cfg.data
        rng = self._record_rng(rec, visit)
        if self.train and d.change_bg_prob > 0 \
                and rng.rand() < d.change_bg_prob:
            bg = self._random_bg(H, W, rng)
            if bg is not None:
                keep = mask_visib.copy()
                if d.truncate_fg:
                    cut = rng.uniform(0.3, 0.7)
                    side = rng.randint(4)
                    uu, vv = np.meshgrid(np.linspace(0, 1, W),
                                         np.linspace(0, 1, H))
                    half = [uu < cut, uu > cut, vv < cut, vv > cut][side]
                    keep = keep * half
                    mask_trunc = keep.astype(np.float32)
                k8 = (keep > 0)[..., None]
                private = dict(frame)
                private["rgb"] = np.where(k8, frame["rgb"], bg)

        packed = ((mask_visib > 0).astype(np.uint8)
                  | ((mask_trunc > 0).astype(np.uint8) << 1))
        if xyz_box is not None and ship_crops:
            x1, y1, x2, y2 = xyz_box
            packed = np.ascontiguousarray(packed[y1:y2 + 1, x1:x2 + 1])
        roi = {"bbox": bbox.astype(np.float32), "mask_packed": packed,
               **self._roi_assets(rec)}
        if xyz16 is not None:
            roi["xyz"] = xyz16
            if xyz_box is not None and ship_crops:
                roi["xyz_offset"] = np.asarray(xyz_box[:2], np.float32)
        return roi, private

    def __call__(self, rec: dict[str, Any],
                 visit: int = 0) -> dict[str, np.ndarray]:
        H, W = rec["height"], rec["width"]
        base = self._decoded_frame(rec)
        rgb = base["rgb"].astype(np.float32)
        depth = base["depth_stored"].astype(np.float32) \
            / float(rec["depth_factor"])
        K = rec["K"]
        R, t = rec["R"], rec["t"]

        # visible-object mask first (needed by the xyz fallback) ----------
        mask_visib = self._mask_visib(rec)

        if rec.get("xyz_path") and os.path.exists(rec["xyz_path"]):
            xyz = self._xyz_full(rec["xyz_path"], H, W)
        else:
            xyz = self._depth_fallback_xyz(depth, rec, mask_visib)

        if mask_visib is None:
            mask_visib = (np.abs(xyz).sum(-1) > 0).astype(np.float32)

        bbox = self._bbox_xyxy(rec, mask_visib)

        # background replacement + foreground truncation (train aug,
        # base_data_loader.py:320-364); labels keep the ORIGINAL visib mask,
        # the truncated mask feeds mask_trunc (data_loader.py:843-848)
        mask_trunc = mask_visib
        d = self.cfg.data
        rng = self._record_rng(rec, visit)
        if self.train and d.change_bg_prob > 0 \
                and rng.rand() < d.change_bg_prob:
            bg = self._random_bg(H, W, rng)
            if bg is not None:
                bg = bg.astype(np.float32)
                keep = mask_visib.copy()
                if d.truncate_fg:
                    cut = rng.uniform(0.3, 0.7)
                    side = rng.randint(4)
                    uu, vv = np.meshgrid(np.linspace(0, 1, W),
                                         np.linspace(0, 1, H))
                    half = [uu < cut, uu > cut, vv < cut, vv > cut][side]
                    keep = keep * half
                    mask_trunc = keep.astype(np.float32)
                rgb = rgb * keep[..., None] + bg * (1 - keep[..., None])

        return {
            "mask_trunc": mask_trunc,
            "rgb": rgb,
            "depth": depth,
            "xyz": xyz.astype(np.float32),
            "mask_visib": mask_visib,
            "bbox": bbox.astype(np.float32),
            **self._roi_assets(rec),
        }


def _stack(samples: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def _pad_roi_crops(rois: list[dict[str, np.ndarray]],
                   pad_bucket: int) -> None:
    """Zero-pad per-ROI GT crops (``xyz`` + ``mask_packed`` shipped with
    an ``xyz_offset``) to the RECTANGULAR batch-max (H, W), each rounded
    up to ``pad_bucket`` so jit sees few distinct shapes. Rectangular
    (not square): one wide object (e.g. a 640-px-wide close-up box)
    would otherwise inflate every crop in the batch to side x side and
    exceed the full-frame bytes this path exists to save. Zero padding
    is semantics-free: the device graph treats out-of-crop pixels as
    zero either way. In-place."""
    if not rois or "xyz_offset" not in rois[0]:
        return
    ph = max(r["xyz"].shape[0] for r in rois)
    pw = max(r["xyz"].shape[1] for r in rois)
    ph = -(-ph // pad_bucket) * pad_bucket
    pw = -(-pw // pad_bucket) * pad_bucket
    for r in rois:
        h, w = r["xyz"].shape[:2]
        if h == ph and w == pw:
            continue
        xyz = np.zeros((ph, pw, 3), r["xyz"].dtype)
        xyz[:h, :w] = r["xyz"]
        mp = np.zeros((ph, pw), r["mask_packed"].dtype)
        mp[:h, :w] = r["mask_packed"]
        r["xyz"], r["mask_packed"] = xyz, mp


def load_train_records(cfg: Config, split_names: str | list[str],
                       cache_dir: str | None = None) -> list[dict]:
    """Concatenated, visibility-filtered records of one or more train
    splits (the reference concatenates all DATASETS.TRAIN names,
    data_loader.py:1046-1060)."""
    if isinstance(split_names, str):
        split_names = [split_names]
    records: list[dict] = []
    for name in split_names:
        records.extend(build_split_records(
            get_split(name), cache_dir=cache_dir, flatten=True))
    if cfg.data.filter_visib_thr > 0:  # visib>=thr filter (ycbv visib20)
        records = [r for r in records
                   if r.get("visib_fract", 1.0) >= cfg.data.filter_visib_thr]
    if not records:
        raise RuntimeError(f"splits {split_names} produced no records")
    return records


def train_frame_iterator(cfg: Config, split_name: str | list[str],
                         decoder: RecordDecoder | None = None,
                         batch_size: int | None = None,
                         seed: int = 0,
                         cache_dir: str | None = None,
                         num_prefetch: int = 2,
                         num_workers: int | None = None) -> Iterator[dict]:
    """Infinite iterator of stacked frame batches ready for
    ``preprocess_batch``. Decoding runs in a thread pool feeding a
    prefetch queue (order-preserving; see ``producer``)."""
    names = [split_name] if isinstance(split_name, str) else list(split_name)
    records = load_train_records(cfg, names, cache_dir=cache_dir)
    split = get_split(names[0])
    ref = get_ref(split.ref_name)
    if decoder is None:
        from .assets import load_class_assets
        assets = load_class_assets(
            ref, cfg.head.num_regions, cfg.loss.num_pm_points,
            objs=list(split.objs) if split.objs else None)
        decoder = RecordDecoder(cfg, assets)
    bs = batch_size or cfg.solver.ims_per_batch
    # per-host data sharding (the reference's rank-sliced samplers,
    # my_distributed_sampler.py:43-54; here hosts shard, devices split the
    # stacked batch via the mesh)
    import jax

    shard_id, num_shards = jax.process_index(), jax.process_count()
    if cfg.data.repeat_factor_thresh > 0:
        # oversample rare categories (dataset_utils.py:231-240 semantics)
        sampler: InfiniteSampler = RepeatFactorSampler(
            [r["cls_idx"] for r in records],
            cfg.data.repeat_factor_thresh, seed=seed,
            shard_id=shard_id, num_shards=num_shards)
    else:
        sampler = InfiniteSampler(len(records), seed=seed,
                                  shard_id=shard_id, num_shards=num_shards)

    if num_workers is None:
        # scale decode parallelism to the host (TPU-VM hosts have ~100
        # vCPUs; a 1-core dev box stays serial — threads only add overhead
        # there)
        num_workers = max(1, min(8, (os.cpu_count() or 1) - 1)) \
            if (os.cpu_count() or 1) > 1 else 1

    q: queue.Queue = queue.Queue(maxsize=num_prefetch)

    def _decode_one(rec, visit):
        try:
            return decoder(rec, visit=visit)
        except (FileNotFoundError, OSError, SkipRecord):
            return None  # skip unreadable frames (reference _rand_another)

    def producer():
        # parallel decode, ordered consumption: cv2 releases the GIL in
        # imdecode, so a thread pool scales PNG decode nearly linearly —
        # a single decode thread caps the host at ~100 frames/s while the
        # chip sustains >3000 poses/s (PERF.md). Futures are consumed in
        # sampler order, so batches are byte-identical to the serial path.
        from collections import Counter, deque
        from concurrent.futures import ThreadPoolExecutor

        idx_iter = iter(sampler)
        visits: Counter = Counter()  # per-record visit counter (aug re-roll)

        def _submit(ex):
            idx = next(idx_iter)
            n = visits[idx]
            visits[idx] += 1
            return ex.submit(_decode_one, records[idx], n)

        with ThreadPoolExecutor(max_workers=num_workers) as ex:
            futs: deque = deque(_submit(ex)
                                for _ in range(2 * num_workers))
            batch = []
            while True:
                fut = futs.popleft()
                futs.append(_submit(ex))
                sample = fut.result()
                if sample is None:
                    continue
                batch.append(sample)
                if len(batch) == bs:
                    q.put(_stack(batch))
                    batch = []

    def producer_guard():
        try:
            producer()
        except BaseException as e:  # surface in the consumer, never hang
            q.put(e)

    th = threading.Thread(target=producer_guard, daemon=True)
    th.start()
    while True:
        item = q.get()
        if isinstance(item, BaseException):
            raise RuntimeError("data loader producer thread failed") \
                from item
        yield item


def train_group_iterator(cfg: Config, split_name: str | list[str],
                         decoder: RecordDecoder | None = None,
                         batch_size: int | None = None,
                         seed: int = 0,
                         cache_dir: str | None = None,
                         num_prefetch: int = 2,
                         num_workers: int | None = None,
                         frame_bucket: int | None = None,
                         yield_keys: bool = False) -> Iterator[dict]:
    """Infinite iterator of FRAME-DEDUPLICATED compact train batches for
    ``preprocess_rois_grouped(train=True)``.

    ``yield_keys=True`` replaces the stacked ``"frames"`` tensors with
    ``"frame_slots"``: a list of ``(cache_key | None, frame_dict)`` per
    frame slot, for the device-resident frame cache
    (data/device_cache.py). key=None marks a private (bg-replaced)
    frame whose pixels differ per visit and must stream.

    Yields ``{"frames": {...}, "rois": {...}}`` where frames carry uint8
    RGB + raw uint16 depth (+factor, K) with one slot per distinct frame,
    and rois carry per-instance compact GT (float16 xyz or none,
    uint8 packed masks) plus ``frame_idx`` into the frame axis. Sampling
    is per FRAME (shuffled; every instance of a drawn frame enters the
    batch — standard detectron2-style per-image sampling) rather than the
    flat path's per-instance shuffle; the batch is trimmed to exactly
    ``batch_size`` ROIs, so a cut frame's trailing instances are dropped
    for that visit (they lead on a later epoch's different trim).

    Why: train batches on the flat path ship ~11 MB of float32 full
    frames PER ROI; this path ships each frame once in compact dtypes —
    the binding host-decode/PCIe constraint on real training (PERF.md).
    """
    names = [split_name] if isinstance(split_name, str) else list(split_name)
    records = load_train_records(cfg, names, cache_dir=cache_dir)
    split = get_split(names[0])
    ref = get_ref(split.ref_name)
    if decoder is None:
        from .assets import load_class_assets
        assets = load_class_assets(
            ref, cfg.head.num_regions, cfg.loss.num_pm_points,
            objs=list(split.objs) if split.objs else None)
        decoder = RecordDecoder(cfg, assets)
    bs = batch_size or cfg.solver.ims_per_batch

    # group record indices by frame
    by_frame: dict[tuple[int, int], list[int]] = {}
    for i, r in enumerate(records):
        by_frame.setdefault((r["scene_id"], r["im_id"]), []).append(i)
    frame_groups = list(by_frame.values())

    # ship xyz if ANY record has a rendered GT map on disk (amodal coords;
    # mixed splits fall back to host-derived f16 per record). A split with
    # none at all skips the per-ROI xyz tensor entirely — the device
    # derives coords from the depth surface post-crop (pipeline.py).
    ship_xyz = any(
        r.get("xyz_path") and os.path.exists(r["xyz_path"])
        for r in records)

    # frame-axis padding bucket: one compiled shape per bucket count
    if frame_bucket is None:
        frame_bucket = max(1, min(8, bs))

    import jax

    shard_id, num_shards = jax.process_index(), jax.process_count()
    if cfg.data.repeat_factor_thresh > 0:
        # image-level repeat factors — the reference's exact semantics
        # (frame frequency + per-frame max, my_distributed_sampler.py:
        # 88-131), so the YCB-V imbalance recipe runs on the fast path
        from .sampler import frame_repeat_factors

        reps = frame_repeat_factors(
            [[records[i]["cls_idx"] for i in g] for g in frame_groups],
            cfg.data.repeat_factor_thresh)
        sampler: InfiniteSampler = RepeatFactorSampler(
            repeat_factors=reps, seed=seed,
            shard_id=shard_id, num_shards=num_shards)
    else:
        sampler = InfiniteSampler(len(frame_groups), seed=seed,
                                  shard_id=shard_id, num_shards=num_shards)

    if num_workers is None:
        num_workers = max(1, min(8, (os.cpu_count() or 1) - 1)) \
            if (os.cpu_count() or 1) > 1 else 1

    q: queue.Queue = queue.Queue(maxsize=num_prefetch)

    def _decode_group(rec_idxs, visit):
        """One frame + all its instances -> list of (frame|None, roi);
        frame None = share the group's base frame."""
        base = records[rec_idxs[0]]
        try:
            frame = decoder.read_frame(base)
        except (FileNotFoundError, OSError):
            return None
        out = []
        for ri in rec_idxs:
            try:
                roi, private = decoder.decode_roi_compact(
                    records[ri], frame, visit=visit, ship_xyz=ship_xyz)
            except (FileNotFoundError, OSError, SkipRecord):
                continue
            out.append((private, roi))
        if not out:
            return None
        return base["rgb_path"], frame, out

    def producer():
        from collections import Counter, deque
        from concurrent.futures import ThreadPoolExecutor

        idx_iter = iter(sampler)
        visits: Counter = Counter()

        def _submit(ex):
            gi = next(idx_iter)
            n = visits[gi]
            visits[gi] += 1
            return ex.submit(_decode_group, frame_groups[gi], n)

        frames_l: list[dict] = []
        keys_l: list[str | None] = []
        rois_l: list[dict] = []
        with ThreadPoolExecutor(max_workers=num_workers) as ex:
            futs: deque = deque(_submit(ex)
                                for _ in range(2 * num_workers))
            while True:
                fut = futs.popleft()
                futs.append(_submit(ex))
                group = fut.result()
                if group is None:
                    continue
                base_key, base_frame, inst = group
                base_idx = None  # lazily claim a slot for the shared frame
                for private, roi in inst:
                    if len(rois_l) == bs:
                        break
                    if private is not None:
                        fidx = len(frames_l)
                        frames_l.append(private)
                        keys_l.append(None)  # per-visit pixels: stream
                    else:
                        if base_idx is None:
                            base_idx = len(frames_l)
                            frames_l.append(base_frame)
                            keys_l.append(base_key)
                        fidx = base_idx
                    roi = dict(roi)
                    roi["frame_idx"] = np.int32(fidx)
                    rois_l.append(roi)
                if len(rois_l) == bs:
                    # pad the frame axis to its bucket (repeat last frame)
                    # so jit sees few distinct shapes
                    F = len(frames_l)
                    Fpad = min(-(-F // frame_bucket) * frame_bucket, bs)
                    while len(frames_l) < Fpad:
                        frames_l.append(frames_l[-1])
                        keys_l.append(keys_l[-1])
                    _pad_roi_crops(rois_l,
                                   int(getattr(cfg.data, "crop_pad", 64)))
                    batch = {"rois": _stack(rois_l)}
                    if yield_keys:
                        batch["frame_slots"] = list(zip(keys_l, frames_l))
                    else:
                        batch["frames"] = _stack(frames_l)
                    q.put(batch)
                    frames_l, keys_l, rois_l = [], [], []

    def producer_guard():
        try:
            producer()
        except BaseException as e:  # surface in the consumer, never hang
            q.put(e)

    th = threading.Thread(target=producer_guard, daemon=True)
    th.start()
    while True:
        item = q.get()
        if isinstance(item, BaseException):
            raise RuntimeError("data loader producer thread failed") \
                from item
        yield item
