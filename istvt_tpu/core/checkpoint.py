"""Checkpoint / resume via Orbax.

The reference saves bare `state_dict` pickles per epoch plus a rolling
`best.pkl` (reference train_CNN.py:986-991,998-1011) and only the I3D
sub-repo checkpoints optimizer state for true resume
(resnet3d/utils/train.py:29-34,100-105). Here every checkpoint is a full
train state (params + model_state + opt_state + step), sharding-aware
(Orbax restores onto the live mesh), with best-metric tracking.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager: save-per-epoch + best."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 best_mode: str = "max", async_save: bool = False):
        """async_save: return from save() as soon as the in-memory
        snapshot is taken and commit to disk on a background thread
        (Orbax's async path), overlapping the write with the next
        epoch's compute. Orbax serializes overlapping saves itself;
        restore()/wait()/close() block on any in-flight commit."""
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.async_save = async_save
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get("metric", 0.0),
                best_mode=best_mode,
                create=True,
            ),
        )

    def save(self, step: int, state: Any, metric: Optional[float] = None,
             wait: Optional[bool] = None):
        """wait: override the constructor's async_save for this call
        (e.g. the preemption signal handler must commit before exit)."""
        metrics = {"metric": float(metric)} if metric is not None else None
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)
        blocking = (not self.async_save) if wait is None else wait
        if blocking:
            self._mgr.wait_until_finished()

    def wait(self):
        """Block until any in-flight async save has committed."""
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        self._mgr.wait_until_finished()
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_pytree(path: str, tree: Any):
    """One-shot save (the analog of torch.save(state_dict))."""
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, tree, force=True)
    ckpt.wait_until_finished()


def load_pytree(path: str, template: Any = None):
    ckpt = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    if template is not None:
        return ckpt.restore(path, template)
    return ckpt.restore(path)
