"""Checkpoint save/restore via orbax.

Counterpart of the reference's detectron2-based ``MyCheckpointer`` +
``PeriodicCheckpointer`` (core/utils/my_checkpoint.py:9-55,
engine.py:207-230): saves params, batch stats, optimizer state and step,
keeps the last ``max_to_keep``, and supports resume-from-latest.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

from ..parallel.train_step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: TrainState,
             extra: dict[str, Any] | None = None) -> None:
        """Async by default: orbax serializes in a background thread and
        the train loop keeps stepping (it blocks only if a previous save
        is still in flight). Call :meth:`wait` before reading the files
        back or exiting the process. The sidecar path waits because it
        writes INTO the finalized step directory."""
        self._mgr.save(step, args=ocp.args.StandardSave({"state": state}))
        if extra:
            self._mgr.wait_until_finished()
            # free-form metadata as a sidecar (an orbax StandardRestore
            # template could not describe an unknown dict shape, so extra
            # inside the tree would break the restore round-trip)
            import json

            with open(os.path.join(self.directory, str(step),
                                   "extra.json"), "w") as f:
                json.dump(extra, f)

    def wait(self) -> None:
        """Block until every in-flight async save is committed."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: int | None = None
                ) -> tuple[TrainState, dict[str, Any]]:
        """Restore into the given abstract/state template; returns
        (state, extra)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state, {}
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore({"state": state}))
        extra: dict[str, Any] = {}
        extra_path = os.path.join(self.directory, str(step), "extra.json")
        if os.path.exists(extra_path):
            import json

            with open(extra_path) as f:
                extra = json.load(f)
        return restored["state"], extra

    def resume_or_load(self, state: TrainState, resume: bool
                       ) -> tuple[TrainState, int]:
        """engine.py:215-222 semantics: if resume and a checkpoint exists,
        restore it and continue from its step; else start fresh."""
        if resume:
            step = self.latest_step()
            if step is not None:
                state, _ = self.restore(state, step)
                return state, int(step)
        return state, 0
