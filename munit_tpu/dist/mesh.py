"""Device mesh + sharding layer — the framework's entire "communication
backend" (SURVEY.md §5.8).

The reference is single-GPU with no distributed code (§2.9); the TPU-native
scaling story is:
- a ``jax.sharding.Mesh`` over all chips with a ``data`` axis (optional
  ``spatial`` axis for HD activation sharding, §5.7);
- batch-sharded inputs (NamedSharding over ``data``), replicated params;
- jit compiles the gradient mean into ICI all-reduces — no NCCL/MPI
  equivalent exists or is needed;
- multi-host: per-host loaders feed disjoint shards
  (``DataLoader(shard_index=process_index, shard_count=process_count)``) and
  ``jax.make_array_from_process_local_data`` assembles global arrays; DCN is
  handled by the runtime.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              spatial: int = 1) -> Mesh:
    """Mesh over all (or given) devices: axes (data, spatial)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % spatial != 0:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    arr = np.asarray(devices).reshape(n // spatial, spatial)
    return Mesh(arr, ("data", "spatial"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over ``data``; H over ``spatial`` when that axis is >1."""
    if mesh.shape["spatial"] > 1:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-local batch dict onto the mesh, batch-sharded."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(mesh: Mesh, state):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def unreplicate(tree):
    """Fetch one copy of a replicated pytree to host."""
    return jax.tree.map(lambda x: np.asarray(x), tree)


def check_spatial_extent(mesh: Mesh, crop: int, n_downsample: int = 2,
                         min_rows: int = 4) -> None:
    """Refuse spatial meshes in the degenerate-shard regime.

    XLA's SPMD partitioner (jax 0.9.0) miscompiles the backward of the
    space-to-depth conv composition when a spatially-sharded stage drops to
    ~2 rows per shard: kernel grads of the s2d conv and everything upstream
    come out exactly DOUBLED, while loss values and input grads stay
    correct — so Adam's scale invariance hides it from loss curves and
    param-level checks (pinned repro:
    tests/test_dist.py::test_xla_spmd_s2d_degenerate_shard_grad_bug).
    Keeping every stage at >= ``min_rows`` rows per shard (measured: 4 is
    clean, 2 is broken at the content resolution) stays out of the regime;
    all production HD configs are far above it.
    """
    sp = mesh.shape.get("spatial", 1)
    if sp <= 1:
        return
    content_rows = crop // (2 ** n_downsample) // sp
    if content_rows < min_rows:
        raise ValueError(
            f"spatial={sp} leaves {content_rows} content rows per shard at "
            f"crop {crop} (< {min_rows}): degenerate spatial shards trigger "
            "an XLA SPMD miscompile that silently doubles generator "
            "gradients (see dist.mesh.check_spatial_extent). Use a smaller "
            "spatial axis or a larger crop.")


def make_global_array(sharding: NamedSharding, x):
    """Multi-host: assemble this process's local shard into a global array.

    With ``jax.process_count() == 1`` this is equivalent to
    ``jax.device_put(x, sharding)``; with more processes it builds the
    global array the jitted step expects from per-host loader shards
    (``DataLoader(shard_index=process_index, shard_count=process_count)``),
    which plain ``device_put`` cannot do."""
    return jax.make_array_from_process_local_data(sharding, x)


def make_global_batch(mesh, local_batch):
    """Multi-host: assemble per-process local shards into global arrays.
    ``mesh`` may be a Mesh or a ready NamedSharding."""
    sh = mesh if isinstance(mesh, NamedSharding) else data_sharding(mesh)
    return jax.tree.map(lambda x: make_global_array(sh, x), local_batch)
