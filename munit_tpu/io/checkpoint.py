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
        """Drain pending writes and release the manager. Idempotent — crash
        paths may drain defensively before the normal-exit close runs."""
        if getattr(self, "_closed", False):
            return
        try:
            self._mgr.wait_until_finished()
        finally:
            # Mark closed / release the manager even when the drain raises —
            # setting _closed before a failed drain would make every later
            # close() a no-op and leak the manager's background machinery.
            self._closed = True
            self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Compact inference (deployment) artifact
# ---------------------------------------------------------------------------
#
# Training checkpoints carry the whole trainer state (params + both ExtraAdam
# moments + the extrapolation snapshot) in f32 — ~6x the bytes a serving host
# needs. ``save_inference_params`` packs the generator params alone into one
# .npz, quantizing the big (ndim>=2) weights to bf16 — free on TPU serving,
# where set_conv_compute casts every conv input to bf16 anyway — while small
# leaves (biases, norm scales) stay f32. bf16 has no numpy dtype in .npz, so
# bf16 leaves are stored as uint16 bit patterns plus a JSON manifest.

_INFERENCE_MAGIC = "munit_tpu-inference-v1"


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_inference_params(path: str, params: Dict[str, Any],
                          quantize_min_ndim: int = 2, quant: str = "bf16"):
    """Write a params-only .npz with quantized weights (see above).

    quant: "bf16" (default, 0.5x f32 bytes, numerically free on TPU) or
    "int8" (0.25x — per-last-axis-channel symmetric scales, same scheme as
    the runtime conv_quant weight quantization; ~0.4% weight RMS error,
    dequantized to full precision at load)."""
    import json
    import jax.numpy as jnp
    if quant not in ("bf16", "int8"):
        raise ValueError(f"unknown quant mode {quant!r}")
    flat = _flatten(jax.device_get(params))
    arrays, manifest = {}, {}
    for i, (key, v) in enumerate(sorted(flat.items())):
        v = np.asarray(v)
        name = f"a{i}"
        if v.ndim >= quantize_min_ndim and v.dtype == np.float32:
            if quant == "int8":
                red = tuple(range(v.ndim - 1))  # per-out-channel (last axis)
                s = np.maximum(np.abs(v).max(axis=red), 1e-8) / 127.0
                arrays[name] = np.clip(
                    np.round(v / s), -127, 127).astype(np.int8)
                arrays[name + "s"] = s.astype(np.float32)
                manifest[key] = {"name": name, "dtype": "int8",
                                 "scale": name + "s"}
                continue
            v = np.asarray(jnp.asarray(v).astype(jnp.bfloat16)).view(np.uint16)
            manifest[key] = {"name": name, "dtype": "bfloat16"}
        else:
            manifest[key] = {"name": name, "dtype": str(v.dtype)}
        arrays[name] = v
    arrays["__manifest__"] = np.frombuffer(
        json.dumps({"magic": _INFERENCE_MAGIC, "keys": manifest}).encode(),
        dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_inference_params(path: str, dtype="float32") -> Dict[str, Any]:
    """Load a ``save_inference_params`` artifact back into a param pytree.

    Quantized leaves are dequantized to ``dtype`` (default f32 — the dtype
    every compute path accepts; set_conv_compute re-casts convs to bf16 on
    TPU anyway, so nothing is lost). Pass ``dtype=None`` to keep the packed
    bf16 leaves."""
    import json
    import jax.numpy as jnp
    with np.load(path) as z:
        manifest = json.loads(bytes(z["__manifest__"]).decode())
        if manifest.get("magic") != _INFERENCE_MAGIC:
            raise ValueError(f"{path} is not a munit_tpu inference artifact")
        flat = {}
        for key, ent in manifest["keys"].items():
            v = z[ent["name"]]
            if ent["dtype"] == "bfloat16":
                a = jnp.asarray(v.view(jnp.bfloat16))
                flat[key] = a if dtype is None else a.astype(dtype)
            elif ent["dtype"] == "int8":
                s = z[ent["scale"]]
                flat[key] = jnp.asarray(
                    (v.astype(np.float32) * s).astype(dtype or "float32"))
            else:
                flat[key] = jnp.asarray(v)
    return _unflatten(flat)


def resume(trainer, ckpt_dir: str) -> int:
    """Reference-style resume (trainer.py:1337-1385): restore the latest
    snapshot into the trainer; returns the iteration to continue from."""
    state, step = restore_checkpoint(ckpt_dir, trainer.state)
    trainer.state = state
    trainer.iterations = step
    print(f"Resume from iteration {step}")
    return step
