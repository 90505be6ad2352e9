"""Device-resident frame cache: full frames cross host->device ONCE.

TPU-first observation: on small/medium splits trained for many epochs
(LM-style: a few hundred to a few thousand frames, 120-160 epochs —
readme.md's LM/LMO recipes), the SAME decoded frames cross the
host->device link every single step. On a relay-attached or otherwise
link-thin host this transfer IS the training bottleneck: PERF.md
measures the grouped path at bs=24 shipping ~15-50 MB of frame bytes
per step against a ~60 ms compute step. HBM, by contrast, is huge
relative to a frame (~1.5 MB uint8+uint16 at 480x640; 16 GB/chip).

This cache keeps decoded frames ON DEVICE keyed by their source path,
bytes-capped with LRU eviction. Per step, the host only uploads frames
not yet resident; the batch's frame stack is assembled device-side from
the cached per-frame arrays (an HBM-to-HBM concat, ~free at 800 GB/s).
Augmentation semantics are untouched:

  * background-replaced / truncated "private" frames (loader
    ``decode_roi_compact``) carry key=None and ALWAYS stream — their
    pixels differ per (record, visit);
  * on-device augmentation (DZI, color aug) happens downstream in
    ``preprocess_rois_grouped`` and re-rolls per visit regardless of
    where the frame bytes came from.

The reference has no counterpart: its dataloader re-decodes + re-ships
every sample every epoch (torch DataLoader workers -> pinned-memory
H2D per batch, core/gdrn_modeling/data_loader.py:1046+).
"""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

__all__ = ["DeviceFrameCache"]


def _nbytes(dev: dict) -> int:
    return sum(int(np.prod(v.shape)) * v.dtype.itemsize
               for v in dev.values())


class DeviceFrameCache:
    """Bytes-capped device-side LRU of per-frame tensor dicts.

    ``stack(slots)`` takes the loader's ``frame_slots`` — a list of
    ``(key | None, frame_numpy_dict)`` — and returns the stacked frames
    dict ``preprocess_rois_grouped`` expects, uploading only the slots
    that are not already resident. Repeated keys inside one batch (the
    frame-bucket padding repeats the last frame) hit the cache.
    """

    def __init__(self, cap_bytes: int):
        if cap_bytes <= 0:
            raise ValueError("DeviceFrameCache needs a positive byte cap")
        self.cap = int(cap_bytes)
        self._cache: OrderedDict[str, dict] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _upload(frame_np: dict) -> dict:
        return {k: jnp.asarray(v) for k, v in frame_np.items()}

    def _insert(self, key: str, dev: dict) -> None:
        nb = _nbytes(dev)
        # never evict below one frame: a frame larger than the cap
        # simply streams (insert skipped)
        if nb > self.cap:
            return
        while self._bytes + nb > self.cap and self._cache:
            _, old = self._cache.popitem(last=False)
            self._bytes -= _nbytes(old)
        self._cache[key] = dev
        self._bytes += nb

    def stack(self, slots: list) -> dict:
        devs = []
        for key, frame in slots:
            if key is None:
                # private (bg-replaced / truncated) frame: per-visit
                # pixels, never cached
                self.misses += 1
                devs.append(self._upload(frame))
            elif key in self._cache:
                self.hits += 1
                self._cache.move_to_end(key)
                devs.append(self._cache[key])
            else:
                self.misses += 1
                dev = self._upload(frame)
                self._insert(key, dev)
                devs.append(dev)
        return {k: jnp.stack([d[k] for d in devs]) for k in devs[0]}

    @property
    def resident_bytes(self) -> int:
        return self._bytes

    def stats(self) -> dict[str, float]:
        """Observability snapshot for the metric writers: the cache is
        load-bearing (PERF.md round 4 measured ~4x step time at the
        gate run), so its behavior must be visible in metrics.json/TB —
        a silently-thrashing cache (cap too small for the epoch's frame
        set) looks identical to a healthy one from the loss curve."""
        total = self.hits + self.misses
        return {
            "frame_cache_hit_rate": self.hits / total if total else 0.0,
            "frame_cache_resident_mb": self._bytes / (1 << 20),
            "frame_cache_frames": float(len(self._cache)),
        }

    def __len__(self) -> int:
        return len(self._cache)
