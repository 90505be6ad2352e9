"""Writers (engine/writers.py): console freshness, JSON lines, buffer
semantics. The console must print the LATEST loss sample — a median over
log-event samples lags by window*log_period iterations (the round-3 bug:
iter-100's line reprinted iter-1's losses)."""

import json
import logging

import numpy as np
import pytest

from rdpn6d_tpu.engine.writers import ConsoleWriter, JsonWriter, MetricBuffer


def test_metric_buffer_latest():
    b = MetricBuffer()
    assert b.latest("loss") == 0.0  # empty -> 0
    b.update({"loss": 9.0})
    b.update({"loss": 5.0})
    assert b.latest("loss") == 5.0
    assert set(b.keys()) == {"loss"}


def test_console_prints_latest_sample(caplog):
    b = MetricBuffer()
    b.update({"total_loss": 9.1531, "loss_PM_R": 0.9478})
    b.update({"total_loss": 5.3570, "loss_PM_R": 0.8860})
    w = ConsoleWriter(max_iter=1000)
    with caplog.at_level(logging.INFO, logger="rdpn6d"):
        w.write(200, b, lr=3e-4)
    line = caplog.records[-1].getMessage()
    assert "total_loss: 5.3570" in line, line   # latest, not the max/median
    assert "loss_PM_R: 0.8860" in line, line
    assert "iter 200/1000" in line


def test_console_filters_non_loss_keys(caplog):
    b = MetricBuffer()
    b.update({"total_loss": 1.0, "loss_mask": 0.5, "grad_norm": 7.0})
    w = ConsoleWriter(max_iter=10)
    with caplog.at_level(logging.INFO, logger="rdpn6d"):
        w.write(1, b, lr=1e-4)
    line = caplog.records[-1].getMessage()
    assert "loss_mask" in line and "total_loss" in line
    assert "grad_norm" not in line


def test_json_writer_appends_lines(tmp_path):
    path = str(tmp_path / "metrics.json")
    w = JsonWriter(path)
    w.write(1, {"total_loss": 9.0, "lr": 1e-4})
    w.write(100, {"total_loss": 5.0, "lr": 3e-4})
    w.close() if hasattr(w, "close") else w._f.flush()
    lines = [json.loads(ln) for ln in open(path)]
    assert len(lines) == 2
    assert lines[0]["total_loss"] == 9.0
    assert lines[1]["total_loss"] == 5.0
    it_key = "iteration" if "iteration" in lines[0] else "step"
    assert lines[1][it_key] == 100


def test_tb_writer_constant_image_not_black(tmp_path, monkeypatch):
    """A constant out-of-range panel (all-255 uint8 mask) must render
    saturated, not black."""
    from rdpn6d_tpu.engine.writers import TensorboardWriter

    w = TensorboardWriter(str(tmp_path))
    if w._writer is None:
        pytest.skip("no tensorboard/TF backend in this environment")
    captured = {}

    real_image = w._tf.summary.image

    def spy(name, data, step=None):
        captured[name] = np.asarray(data)
        return real_image(name, data, step=step)

    monkeypatch.setattr(w._tf.summary, "image", spy)
    w.write_images(3, {"mask": np.full((8, 8), 255, np.uint8)})
    assert captured["mask"].max() == 1.0  # saturated white, not black
