"""Checkpoint save/resume via orbax.

Reference semantics (trainer.py:1337-1429, SURVEY.md §5.4): snapshot every
``snapshot_save_iter``, resume from the latest. Here the ENTIRE trainer state
(all net params, all optimizer states including the ExtraAdam extrapolation
snapshot, step count, RNG key, display styles) is ONE pytree, so resume is
exact — fixing the reference's unsaved aux optimizers and mid-extrapolation
``params_copy`` loss.

Multi-host: orbax handles coordinated save/restore so all hosts resume the
same step (§5.3).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, keep: Optional[int] = None) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, create=True, enable_async_checkpointing=False)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


def save_checkpoint(ckpt_dir: str, state: Dict[str, Any], step: int,
                    keep: Optional[int] = None):
    mgr = _manager(ckpt_dir, keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, template_state: Dict[str, Any],
                       step: Optional[int] = None) -> tuple[Dict[str, Any], int]:
    """Restore into the template's structure. Returns (state, step)."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {ckpt_dir}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template_state)
    state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return state, int(step)


class CheckpointWriter:
    """Persistent manager with ASYNC I/O for the training loop.

    ``save()`` snapshots the device arrays (a fast D2H copy) and returns;
    serialization and disk writes run on orbax's background thread,
    overlapping subsequent train steps instead of stalling the loop for the
    full multi-second whole-state write (the one-shot ``save_checkpoint``
    blocks — fine for CLIs/tests, not for the hot loop). Multi-host
    coordination is orbax's (SURVEY §5.3). Call ``close()`` (or use as a
    context manager) to drain pending writes."""

    def __init__(self, ckpt_dir: str, keep: Optional[int] = None,
                 async_io: bool = True):
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True,
            enable_async_checkpointing=async_io)
        self._mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir),
                                          options=options)

    def save(self, state: Dict[str, Any], step: int):
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def resume(trainer, ckpt_dir: str) -> int:
    """Reference-style resume (trainer.py:1337-1385): restore the latest
    snapshot into the trainer; returns the iteration to continue from."""
    state, step = restore_checkpoint(ckpt_dir, trainer.state)
    trainer.state = state
    trainer.iterations = step
    print(f"Resume from iteration {step}")
    return step
