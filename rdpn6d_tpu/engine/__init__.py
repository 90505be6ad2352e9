"""Engine: trainer, checkpointing, writers (counterpart of core/gdrn_modeling/engine.py)."""

from .checkpoint import CheckpointManager
from .trainer import Trainer
from .writers import ConsoleWriter, JsonWriter, MetricBuffer, TensorboardWriter

__all__ = ["CheckpointManager", "Trainer", "ConsoleWriter", "JsonWriter",
           "MetricBuffer", "TensorboardWriter"]
