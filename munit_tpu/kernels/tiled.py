"""Tiled two-pass fused norms — large-slab Pallas path (r2 design, BENCH.md).

The single-slab kernels in norms.py require the whole (H, W, C) feature map in
VMEM; with the Pallas pipeline double-buffering in+out blocks, slabs above
~2MB exceed scoped VMEM inside the full train-step graph. This module splits
the work into HW tiles small enough to pipeline:

pass 1 (pallas): per-tile partial sums (sum, sum of squares) per channel;
jnp glue      : reduce partials → per-(sample,channel) mean / rstd;
pass 2 (pallas): normalize + scale/shift + activation per tile.

HBM traffic: two reads + one write of x — the same as XLA's fused reduction,
but the affine/activation epilogue rides the second pass for free and the
whole chain is three ops instead of XLA's many. Backward uses the same
recompute-stats custom VJPs as norms.py (residual = x only).

Enabled via the dispatchers when MUNIT_PALLAS=1 and the slab exceeds the
single-slab budget; tile height is chosen so a tile is ≤ ~512KB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from munit_tpu.kernels import norms as _norms

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_TILE_BYTES = 512 * 1024
_EPS = 1e-5


def _tile_rows(h: int, w: int, c: int, itemsize: int = 4) -> int:
    """Largest power-of-two divisor of h whose tile fits the budget."""
    th = h
    while th > 1 and th * w * c * itemsize > _TILE_BYTES:
        if h % (th // 2) != 0:
            break
        th //= 2
    return th


def _stats_kernel(x_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)          # (TH, W, C)
    s = jnp.sum(x, axis=(0, 1))
    s2 = jnp.sum(x * x, axis=(0, 1))
    out_ref[0, 0] = jnp.stack([s, s2])        # (2, C)


def _norm_kernel(x_ref, stats_ref, g_ref, b_ref, o_ref, *, relu: bool,
                 affine: bool):
    i = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)
    mean = stats_ref[i, 0][None, None, :]
    rstd = stats_ref[i, 1][None, None, :]
    y = (x - mean) * rstd
    if affine:
        y = y * g_ref[i][None, None, :] + b_ref[i][None, None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _tiled_forward(x, gamma, beta, relu, affine):
    b, h, w, c = x.shape
    th = _tile_rows(h, w, c)
    t = h // th
    interpret = _norms._interpret()

    partials = pl.pallas_call(
        _stats_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, 2, c), jnp.float32),
        grid=(b, t),
        in_specs=[pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 2, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)

    n = h * w
    s = jnp.sum(partials[:, :, 0], axis=1)          # (B, C)
    s2 = jnp.sum(partials[:, :, 1], axis=1)
    mean = s / n
    var = s2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + _EPS)
    stats = jnp.stack([mean, rstd], axis=1)          # (B, 2, C)

    kern = functools.partial(_norm_kernel, relu=relu, affine=affine)
    g = gamma if affine else jnp.zeros((b, c), jnp.float32)
    bt = beta if affine else jnp.zeros((b, c), jnp.float32)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # stats (B,2,C), whole
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gamma (B,C), whole
            pl.BlockSpec(memory_space=pltpu.VMEM),   # beta  (B,C), whole
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, stats, g, bt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_tiled(x, relu: bool = False):
    """Instance norm (+optional ReLU), HW-tiled two-pass Pallas."""
    return _tiled_forward(x, None, None, relu, affine=False)


instance_norm_tiled.defvjp(
    lambda x, relu: (instance_norm_tiled(x, relu), (x,)), _norms._in_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def adain_tiled(x, gamma, beta, relu: bool = False):
    """AdaIN (+optional ReLU), HW-tiled two-pass Pallas. gamma/beta: (B, C)."""
    return _tiled_forward(x, gamma, beta, relu, affine=True)


adain_tiled.defvjp(
    lambda x, gamma, beta, relu: (adain_tiled(x, gamma, beta, relu),
                                  (x, gamma, beta)),
    _norms._adain_bwd)


def tiled_applicable(x) -> bool:
    b, h, w, c = x.shape
    return (c % 128 == 0 and w * c * 4 <= _TILE_BYTES * 2
            and (h & (h - 1)) == 0)  # power-of-two H for clean tiling
