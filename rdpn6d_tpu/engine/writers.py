"""Metric writers: console, JSON-lines, TensorBoard.

Counterpart of the reference's EventStorage writer trio
(core/utils/my_writer.py:14-266): MyCommonMetricPrinter (console with ETA),
MyJSONWriter (metrics.json lines), MyTensorboardXWriter. TensorBoard output
uses tf.summary when tensorflow is importable, otherwise it is skipped.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any

logger = logging.getLogger("rdpn6d")


class MetricBuffer:
    """Latest-sample store (EventStorage's storage role; medians are
    deliberately NOT offered — samples arrive only at log events, so a
    window median would lag by window*log_period iterations; and only
    the latest value is read, so no history is kept either)."""

    def __init__(self):
        self._last: dict[str, float] = {}

    def update(self, metrics: dict[str, float]) -> None:
        for k, v in metrics.items():
            self._last[k] = float(v)

    def latest(self, key: str) -> float:
        return self._last.get(key, 0.0)

    def keys(self):
        return self._last.keys()


class ConsoleWriter:
    """ETA / losses / lr line printer (my_writer.py:109-199)."""

    def __init__(self, max_iter: int):
        self.max_iter = max_iter
        self._start = time.time()
        self._start_iter: int | None = None

    def write(self, step: int, buf: MetricBuffer, lr: float) -> None:
        if self._start_iter is None:
            self._start_iter = step
            self._start = time.time()
        done = max(step - self._start_iter, 1)
        rate = (time.time() - self._start) / done
        eta = rate * (self.max_iter - step)
        # print the LATEST sample, not the median: the buffer is fed only
        # at log events, so a median over its window would span
        # window*log_period iterations and lag badly (the reference's
        # EventStorage medians over per-ITERATION samples, which we don't
        # collect to avoid a per-step host sync)
        losses = "  ".join(
            f"{k}: {buf.latest(k):.4f}" for k in sorted(buf.keys())
            if k.startswith("loss") or k == "total_loss")
        logger.info(
            f"iter {step}/{self.max_iter}  eta {eta / 60:.1f}m  "
            f"{rate:.3f}s/it  lr {lr:.2e}  {losses}")


class JsonWriter:
    """metrics.json lines (my_writer.py MyJSONWriter)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")

    def write(self, step: int, metrics: dict[str, Any]) -> None:
        row = {"iteration": step}
        row.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class TensorboardWriter:
    """Scalar summaries through tf.summary (my_writer.py TBX writer)."""

    def __init__(self, logdir: str):
        try:
            import tensorflow as tf  # noqa: PLC0415
            self._tf = tf
            self._writer = tf.summary.create_file_writer(logdir)
        except Exception:  # pragma: no cover - tf optional
            self._tf = None
            self._writer = None

    def write(self, step: int, metrics: dict[str, Any]) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            for k, v in metrics.items():
                self._tf.summary.scalar(k, float(v), step=step)
            self._writer.flush()

    def write_histograms(self, step: int, tensors: dict[str, Any]) -> None:
        """Histogram summaries (my_writer.py:200-266 MyTensorboardXWriter
        histogram support). ``tensors`` maps name -> array-like."""
        if self._writer is None:
            return
        import numpy as np

        with self._writer.as_default():
            for k, v in tensors.items():
                arr = np.asarray(v, np.float32).ravel()
                if arr.size == 0:
                    continue
                self._tf.summary.histogram(k, arr, step=step)
            self._writer.flush()

    def write_images(self, step: int, images: dict[str, Any]) -> None:
        """Image panels (input / pred-coords / gt-coords / masks — the
        trainer's TB visualization, engine.py:331-367). Images are [H,W,C]
        float in [0,1] or [H,W]."""
        if self._writer is None:
            return
        import numpy as np

        with self._writer.as_default():
            for k, img in images.items():
                arr = np.asarray(img, np.float32)
                if arr.ndim == 2:
                    arr = arr[..., None]
                lo, hi = arr.min(), arr.max()
                if hi > 1.0 or lo < 0.0:
                    if hi > lo:
                        arr = (arr - lo) / (hi - lo)
                    else:
                        # constant out-of-range image (e.g. an all-255
                        # uint8 mask): show saturated, not black
                        arr = np.ones_like(arr)
                self._tf.summary.image(k, arr[None], step=step)
            self._writer.flush()
