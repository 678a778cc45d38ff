"""Pallas TPU kernels for the norm-heavy hot ops (SURVEY.md §7 step 8).

The MUNIT hot loop is dominated by conv → {InstanceNorm | AdaIN | custom-LN}
→ activation chains. These kernels fuse the two-pass normalization with the
scale/shift and activation epilogue into a single VMEM-resident pass per
sample, saving HBM round-trips where XLA materializes the normalized
intermediate.

Scope: one grid step per batch element; the (H, W, C) slab must fit VMEM
(~16MB/core). That covers every AdaIN layer of the decoder res-blocks and the
content-encoder res-blocks at 256² training (64×64×256 f32 = 4MB); larger
early-encoder slabs fall back to the jnp path automatically.

Training-capable: custom VJP with stats recomputed in the backward kernel
(cheaper than saving x̂; one extra VMEM pass, zero extra HBM residuals beyond
x itself).

Numerics match munit_tpu.core.ops exactly (biased variance, eps=1e-5; LN uses
unbiased std with eps on the std).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from munit_tpu.core import ops as _ops

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# The kernel keeps ~3 slab-sized values live (input, centered, output).
# Empirically (BENCH.md r1): 4MB slabs (64×64×256 f32 — the res-block layers
# at 256² training) pass in isolation but OOM scoped VMEM when XLA schedules
# the custom call inside the full train-step graph next to conv buffers, so
# the dispatch threshold is conservative. Larger-slab coverage needs a tiled
# two-pass design (r2).
_VMEM_BUDGET_BYTES = 2 * 1024 * 1024
_EPS = 1e-5


def _budget() -> int:
    import os
    mb = os.environ.get("MUNIT_PALLAS_VMEM_MB")
    return int(mb) * 1024 * 1024 if mb else _VMEM_BUDGET_BYTES


def pallas_available() -> bool:
    # Default OFF, matching bench.py: both measured kernel designs lose to
    # XLA's fused norms on TPU (BENCH.md negative results), so production
    # behavior and the shipped benchmark agree. MUNIT_PALLAS=1 opts in for
    # A/B runs.
    import os
    if os.environ.get("MUNIT_PALLAS", "0") != "1":
        return False
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _slab_fits(x) -> bool:
    h, w, c = x.shape[1:]
    return h * w * c * 4 <= _budget() and c % 128 == 0 \
        and (h * w) % 8 == 0


def _interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Forward kernels
# ---------------------------------------------------------------------------


def _in_fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, relu: bool, affine: bool):
    x = x_ref[0].astype(jnp.float32)           # (H, W, C)
    hw = x.shape[0] * x.shape[1]
    mean = jnp.sum(x, axis=(0, 1), keepdims=True) / hw
    d = x - mean
    var = jnp.sum(d * d, axis=(0, 1), keepdims=True) / hw
    y = d * jax.lax.rsqrt(var + _EPS)
    if affine:
        i = pl.program_id(0)
        y = y * g_ref[i][None, None, :] + b_ref[i][None, None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _compiler_params(slab_bytes: int):
    """Bound the kernel's VMEM so XLA can schedule it inside large graphs
    (unbounded kernels OOM'd scoped VMEM next to conv buffers — BENCH.md)."""
    if _interpret():
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(int(slab_bytes * 3.5) + (1 << 20), 14 << 20))


def _run_in_fwd(x, gamma, beta, relu, affine):
    b = x.shape[0]
    c = x.shape[-1]
    kern = functools.partial(_in_fwd_kernel, relu=relu, affine=affine)
    g = gamma if affine else jnp.zeros((b, c), x.dtype)
    bta = beta if affine else jnp.zeros((b, c), x.dtype)
    slab = int(np.prod(x.shape[1:])) * x.dtype.itemsize
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1,) + x.shape[1:], lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # full (B, C) arrays (tiny); indexed by program_id in the kernel —
            # a (1, C) block would violate the (8, 128) min-tile rule
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1,) + x.shape[1:], lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_compiler_params(slab),
        interpret=_interpret(),
    )(x, g, bta)


# ---------------------------------------------------------------------------
# Public fused ops with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def adain_fused(x, gamma, beta, relu: bool = False):
    """AdaIN (+optional ReLU): per-(sample,channel) instance norm then
    per-sample scale/shift. gamma, beta: (B, C)."""
    return _run_in_fwd(x, gamma, beta, relu, affine=True)


def _adain_fwd(x, gamma, beta, relu):
    return adain_fused(x, gamma, beta, relu), (x, gamma, beta)


def _adain_bwd(relu, res, dy):
    x, gamma, beta = res
    # jnp fallback backward (correct everywhere; pallas bwd kernel is a
    # later optimization — forward fusion is where the HBM win is)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mean) * rstd
    g = gamma.astype(jnp.float32)[:, None, None, :]
    dyf = dy.astype(jnp.float32)
    if relu:
        fwd = xhat * g + beta.astype(jnp.float32)[:, None, None, :]
        dyf = jnp.where(fwd > 0, dyf, 0.0)
    dgamma = jnp.sum(dyf * xhat, axis=(1, 2)).astype(gamma.dtype)
    dbeta = jnp.sum(dyf, axis=(1, 2)).astype(beta.dtype)
    dyg = dyf * g
    m1 = jnp.mean(dyg, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=(1, 2), keepdims=True)
    dx = ((dyg - m1 - xhat * m2) * rstd).astype(x.dtype)
    return dx, dgamma, dbeta


adain_fused.defvjp(_adain_fwd, _adain_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_fused(x, relu: bool = False):
    """Affine-less instance norm (+optional ReLU), VMEM-fused per sample."""
    return _run_in_fwd(x, None, None, relu, affine=False)


def _in_fwd(x, relu):
    return instance_norm_fused(x, relu), (x,)


def _in_bwd(relu, res, dy):
    (x,) = res
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mean) * rstd
    dyf = dy.astype(jnp.float32)
    if relu:
        dyf = jnp.where(xhat > 0, dyf, 0.0)
    m1 = jnp.mean(dyf, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(dyf * xhat, axis=(1, 2), keepdims=True)
    dx = ((dyf - m1 - xhat * m2) * rstd).astype(x.dtype)
    return (dx,)


instance_norm_fused.defvjp(_in_fwd, _in_bwd)


# ---------------------------------------------------------------------------
# Whole-tensor LayerNorm
# ---------------------------------------------------------------------------


def _ln_fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, relu: bool, n: int):
    x = x_ref[0].astype(jnp.float32)
    mean = jnp.sum(x) / n
    d = x - mean
    var_b = jnp.sum(d * d) / n
    std = jnp.sqrt(var_b * (n / (n - 1)))
    y = d / (std + _EPS)
    y = y * g_ref[0, 0][None, None, :] + b_ref[0, 0][None, None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def whole_layer_norm_fused(x, gamma, beta, relu: bool = False):
    """The fork's whole-tensor LayerNorm (+optional ReLU). gamma,beta: (C,)."""
    b, h, w, c = x.shape
    n = h * w * c
    kern = functools.partial(_ln_fwd_kernel, relu=relu, n=n)
    g2 = jnp.broadcast_to(gamma[None, None, :], (1, 1, c))
    b2 = jnp.broadcast_to(beta[None, None, :], (1, 1, c))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x, g2, b2)


def _ln_fwd(x, gamma, beta, relu):
    return whole_layer_norm_fused(x, gamma, beta, relu), (x, gamma, beta)


def _ln_bwd(relu, res, dy):
    x, gamma, beta = res

    def f(x, gamma, beta):
        y = _ops.whole_layer_norm(x, gamma, beta)
        return jnp.maximum(y, 0.0) if relu else y

    _, vjp = jax.vjp(f, x, gamma, beta)
    return vjp(dy)


whole_layer_norm_fused.defvjp(_ln_fwd, _ln_bwd)


# ---------------------------------------------------------------------------
# jnp reference paths with the SAME custom VJPs
#
# Default autodiff through the norms saves the f32-upcast input plus
# normalized intermediates as residuals — at batch 16/256² those f32 copies
# are the largest HBM buffers in the train step (BENCH.md). These wrappers
# keep the XLA forward but recompute stats in the backward, so the only
# residual is x itself (in its own dtype).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_ref(x, relu: bool = False):
    y = _ops.instance_norm(x)
    return jnp.maximum(y, 0) if relu else y


instance_norm_ref.defvjp(lambda x, relu: (instance_norm_ref(x, relu), (x,)),
                         _in_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def adain_ref(x, gamma, beta, relu: bool = False):
    y = _ops.adain(x, gamma, beta)
    return jnp.maximum(y, 0) if relu else y


adain_ref.defvjp(
    lambda x, gamma, beta, relu: (adain_ref(x, gamma, beta, relu),
                                  (x, gamma, beta)),
    _adain_bwd)


# ---------------------------------------------------------------------------
# Dispatchers (used by nn blocks when enabled)
# ---------------------------------------------------------------------------


def maybe_instance_norm(x, relu=False):
    if pallas_available():
        if _slab_fits(x):
            return instance_norm_fused(x, relu)
        from munit_tpu.kernels.tiled import (instance_norm_tiled,
                                             tiled_applicable)
        if tiled_applicable(x):
            return instance_norm_tiled(x, relu)
    return instance_norm_ref(x, relu)


def maybe_adain(x, gamma, beta, relu=False):
    if pallas_available():
        if _slab_fits(x):
            return adain_fused(x, gamma, beta, relu)
        from munit_tpu.kernels.tiled import adain_tiled, tiled_applicable
        if tiled_applicable(x):
            return adain_tiled(x, gamma, beta, relu)
    return adain_ref(x, gamma, beta, relu)
