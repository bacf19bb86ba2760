"""Checkpoint / resume via Orbax (SURVEY.md §5 "Checkpoint / resume").

Replaces the reference's ``torch.save({model, optimizer, scheduler,
epoch})`` per-epoch checkpointing with an Orbax CheckpointManager:
async-capable, keep-last-k, auto-resume from latest.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from closerlook3d_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True),
        )

    def save(self, step: int, state: TrainState, extra: Optional[dict] = None):
        payload = {"state": state}
        if extra:
            payload["extra"] = extra
        self._mgr.save(step, args=ocp.args.Composite(
            **{k: ocp.args.StandardSave(v) for k, v in payload.items()}))

    def restore(self, state_template: TrainState, step: Optional[int] = None):
        """Restore latest (or given) step; returns (state, extra, step)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None, None
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)))
        extra = None
        try:
            extra = self._mgr.restore(
                step, args=ocp.args.Composite(
                    extra=ocp.args.StandardRestore()))["extra"]
        except Exception:
            pass
        return restored["state"], extra, step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
