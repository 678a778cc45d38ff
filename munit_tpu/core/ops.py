"""Pure functional ops for munit_tpu.

All image tensors are NHWC (TPU-native layout; the reference is NCHW torch).
Numerical semantics mirror the reference implementation exactly where parity
matters (see each docstring's file:line citation into /root/reference):

- ``instance_norm``      : torch ``nn.InstanceNorm2d`` defaults (affine-less,
                           eps=1e-5, biased variance) — networks.py:657.
- ``adain``              : the reference computes AdaIN through an
                           ``F.batch_norm`` reshape trick (networks.py:823-845);
                           mathematically it is per-(sample, channel) instance
                           normalization with externally supplied scale/shift.
- ``whole_layer_norm``   : the fork's nonstandard LayerNorm (networks.py:851-878):
                           per-sample statistics over the WHOLE (C,H,W) tensor
                           using the *unbiased* std, and eps added to the std
                           (not the variance), then per-channel affine.
- ``avg_pool_3x3_s2``    : ``nn.AvgPool2d(3, stride=2, padding=1,
                           count_include_pad=False)`` — networks.py:32-34.
- ``upsample_nearest``   : ``nn.Upsample(scale_factor=2)`` — networks.py:534.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# Padding
# ---------------------------------------------------------------------------


def _pad2d_fold_bwd(g: jax.Array, p: int, mode: str) -> jax.Array:
    """Transpose of 2-D reflect/edge padding as ONE fused full-tensor pass.

    The r2 strip-built version folded the halo with one concatenation per
    axis — two full-tensor writes, which XLA lowered to zero-init
    broadcasts + dynamic-update-slice chains (~25 ms of the fused train
    step at 256²/batch 8, r3 trace + HLO estimated-cycle model). Writing
    the result instead as ``interior + Σ zero-padded flipped border
    strips`` is a single elementwise expression XLA fuses into ONE kLoop
    pass over the output: each element reads its direct source plus (near
    the border only) the in-window strip terms. Same additions, one
    full-tensor write instead of two, and no DUS/zero-init machinery.
    """
    n = g.shape[1] - 2 * p             # un-padded height
    m = g.shape[2] - 2 * p             # un-padded width

    def padz(t, ro, co):
        """Zero-embed strip t into the (n, m) output at (ro, co)."""
        cfg = ((0, 0, 0), (ro, n - ro - t.shape[1], 0),
               (co, m - co - t.shape[2], 0), (0, 0, 0))
        return lax.pad(t, jnp.zeros((), t.dtype), cfg)

    out = g[:, p:p + n, p:p + m, :]
    if mode == "reflect":
        # padded row r<p sources input row p-r (flip of the top band adds
        # to rows 1..p); r>=n+p sources 2n+p-2-r (rows n-2..n-1-p); the
        # corner blocks are double reflections into rows/cols 1..p etc.
        fl = jnp.flip
        top = fl(g[:, 0:p, p:p + m, :], 1)
        bot = fl(g[:, n + p:n + 2 * p, p:p + m, :], 1)
        left = fl(g[:, p:p + n, 0:p, :], 2)
        right = fl(g[:, p:p + n, m + p:m + 2 * p, :], 2)
        tl = fl(fl(g[:, 0:p, 0:p, :], 1), 2)
        tr = fl(fl(g[:, 0:p, m + p:m + 2 * p, :], 1), 2)
        bl = fl(fl(g[:, n + p:n + 2 * p, 0:p, :], 1), 2)
        br = fl(fl(g[:, n + p:n + 2 * p, m + p:m + 2 * p, :], 1), 2)
        return (out
                + padz(top, 1, 0) + padz(bot, n - 1 - p, 0)
                + padz(left, 0, 1) + padz(right, 0, m - 1 - p)
                + padz(tl, 1, 1) + padz(tr, 1, m - 1 - p)
                + padz(bl, n - 1 - p, 1) + padz(br, n - 1 - p, m - 1 - p))
    # replicate: every border row/col sources the edge row/col
    s1 = lambda t: jnp.sum(t.astype(jnp.promote_types(t.dtype, jnp.float32)),
                           axis=1, keepdims=True)
    s2 = lambda t: jnp.sum(t.astype(jnp.promote_types(t.dtype, jnp.float32)),
                           axis=2, keepdims=True)
    top = s1(g[:, 0:p, p:p + m, :]).astype(g.dtype)
    bot = s1(g[:, n + p:n + 2 * p, p:p + m, :]).astype(g.dtype)
    left = s2(g[:, p:p + n, 0:p, :]).astype(g.dtype)
    right = s2(g[:, p:p + n, m + p:m + 2 * p, :]).astype(g.dtype)
    tl = s1(s2(g[:, 0:p, 0:p, :])).astype(g.dtype)
    tr = s1(s2(g[:, 0:p, m + p:m + 2 * p, :])).astype(g.dtype)
    bl = s1(s2(g[:, n + p:n + 2 * p, 0:p, :])).astype(g.dtype)
    br = s1(s2(g[:, n + p:n + 2 * p, m + p:m + 2 * p, :])).astype(g.dtype)
    return (out
            + padz(top, 0, 0) + padz(bot, n - 1, 0)
            + padz(left, 0, 0) + padz(right, 0, m - 1)
            + padz(tl, 0, 0) + padz(tr, 0, m - 1)
            + padz(bl, n - 1, 0) + padz(br, n - 1, m - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pad2d_nonzero(x: jax.Array, padding: int, mode: str) -> jax.Array:
    p = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jnp.pad(x, p, mode="reflect" if mode == "reflect" else "edge")


def _pad2d_fwd(x, padding, mode):
    return _pad2d_nonzero(x, padding, mode), None


def _pad2d_bwd(padding, mode, _, g):
    return (_pad2d_fold_bwd(g, padding, mode),)


_pad2d_nonzero.defvjp(_pad2d_fwd, _pad2d_bwd)


def pad2d(x: jax.Array, padding: int, mode: str) -> jax.Array:
    """Spatially pad an NHWC tensor.

    mode: 'reflect' | 'replicate' | 'zero'  (networks.py:641-649)

    reflect/replicate use a custom VJP (see ``_pad2d_fold_bwd``) whose
    backward folds the halo gradients in a single fused full-tensor pass
    instead of XLA's per-axis slice+add / dynamic-update-slice chains.

    The result is tagged ``conv_pad`` (jax.ad_checkpoint.checkpoint_name):
    inert under plain autodiff, but inside a jax.checkpoint region with the
    save-everything-except-conv_pad policy (GenBundle) the padded copies —
    the largest train-step HBM buffers at big batches (BENCH.md) — are
    recomputed in the backward instead of stored. Recompute cost ≈ a pad.
    """
    if padding == 0:
        return x
    from jax.ad_checkpoint import checkpoint_name
    if mode in ("reflect", "replicate"):
        # strip construction needs non-overlapping border bands
        if 2 * padding + 2 <= min(x.shape[1], x.shape[2]):
            y = _pad2d_nonzero(x, padding, mode)
        else:
            p = ((0, 0), (padding, padding), (padding, padding), (0, 0))
            y = jnp.pad(x, p,
                        mode="reflect" if mode == "reflect" else "edge")
    elif mode == "zero":
        y = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding),
                        (0, 0)), mode="constant")
    else:
        raise ValueError(f"Unsupported padding type: {mode}")
    return checkpoint_name(y, "conv_pad")


# ---------------------------------------------------------------------------
# Convolution (NHWC x HWIO -> NHWC), explicit pre-padding like the reference
# ---------------------------------------------------------------------------

_DIMS = ("NHWC", "HWIO", "NHWC")

# Global conv numerics knobs. Parity mode (default): f32 operands with
# HIGHEST precision (required to match the torch reference bit-closely).
# Performance mode (bench / production training): bf16 operands on the MXU
# with f32 accumulation — set via set_conv_compute(jnp.bfloat16).
_CONV_PRECISION = lax.Precision.HIGHEST
_CONV_DTYPE = None  # None → use operand dtypes as-is


def set_conv_compute(dtype=None, precision=lax.Precision.HIGHEST):
    """Configure conv numerics globally (call before tracing/jit).

    dtype: None (parity) or jnp.bfloat16 (MXU-native multiply, f32 accumulate,
    f32 outputs — norms/losses stay in f32).
    """
    global _CONV_PRECISION, _CONV_DTYPE
    _CONV_PRECISION = precision
    _CONV_DTYPE = dtype


def conv_compute_dtype():
    """The configured conv multiply dtype (None in parity mode). Consumers
    that choose an ACTIVATION dtype (the training loop's device prefetch)
    must key off this, not off the config string — train_loop can be driven
    directly without the CLI's set_conv_compute call, and bf16 activations
    against f32 kernels is a trace-time dtype error."""
    return _CONV_DTYPE


# --- int8 (W8A8) quantized convolutions — INFERENCE ONLY -------------------
#
# TPU v5e's MXU runs s8 x s8 -> s32 at ~2x the bf16 rate; measured on the
# generator's shapes (tools/int8probe.py): up 5x5 convs 1.57-1.59x, res 3x3
# 1.19x, stride-2 down convs a wash (data-bound). Three modes:
# - dynamic: per-dispatch per-tensor activation scale (max|x|/127). Needs no
#   calibration but the per-conv max-reduce + quantize passes cost more than
#   the MXU win on this data-movement-bound net (measured e2e 2.38 vs
#   1.49 ms/image, BENCH.md) — kept as the robust fallback.
# - record: full-precision convs that also emit each site's max|x| (traced
#   scalars appended to a caller list, in trace order) — the calibration
#   pass.
# - static: per-SITE activation scales baked as compile-time constants, so
#   the quantize is a single fusable elementwise op and the max-reduce
#   disappears. Sites are identified by trace-order index: tracing a fixed
#   Python body is deterministic, so call N in calibration is call N in
#   inference.
# Weight scales are always per-output-channel from the kernel itself; when
# params are closed over (the serving/CLI pattern), XLA constant-folds the
# weight quantization at compile time. round() makes every mode except
# 'record' non-differentiable: never enable during training.
_QUANT_STATE: "dict | None" = None


@contextlib.contextmanager
def conv_quant(enabled: bool = True, scales=None,
               record: "list | None" = None, all_convs: bool = False):
    """Scope int8 quantized convs around a traced region.

    The state is read at TRACE time, so wrapping the Python body of a jitted
    function quantizes exactly the convs inside the scope (e.g. the
    generator's encode/decode) while leaving co-traced models (inception,
    VGG, segmenter) in full precision.

    scales: sequence of per-site max|activation| floats (from a 'record'
    calibration run) → static mode. record: a list to append traced per-site
    max|x| scalars to → record mode. Neither → dynamic mode.
    all_convs: bypass the _quant_worthwhile shape heuristic and quantize
    every conv in scope (tests; A/B probes).
    """
    global _QUANT_STATE
    old = _QUANT_STATE
    if not enabled:
        _QUANT_STATE = None
    elif record is not None:
        _QUANT_STATE = {"mode": "record", "record": record,
                        "all": all_convs}
    elif scales is not None:
        _QUANT_STATE = {"mode": "static", "scales": list(scales), "idx": 0,
                        "all": all_convs}
    else:
        _QUANT_STATE = {"mode": "dynamic", "all": all_convs}
    try:
        yield
    finally:
        _QUANT_STATE = old


def _quant_worthwhile(x_shape, k_shape, stride: int) -> bool:
    """Shape heuristic: quantize only convs where int8 measurably wins.

    Measured (tools/int8probe.py / int8probe2.py, v5e): MXU-bound stride-1
    convs with >=128 channels on both sides win 1.2-1.6x even with the
    quantize/dequantize passes and materialized reflect pads in the chain;
    stride-2 down convs are a wash and full-resolution small-channel convs
    are data-bound, so their quantize pass is pure loss (the first e2e
    attempt quantized everything and measured 1.3x SLOWER, BENCH.md).
    """
    kh, kw, cin, cout = k_shape
    if stride != 1:
        return False
    if min(cin, cout) < 128:
        return False
    if x_shape[1] * x_shape[2] > 160 * 160:
        return False  # full-res slabs: quantize traffic exceeds the MXU win
    return True


def _conv2d_int8(x: jax.Array, kernel: jax.Array, stride: int,
                 dilation: int) -> jax.Array:
    """W8A8: quantize, s8xs8->s32 conv, dequantize. Returns f32.

    Exact whenever x and kernel already sit on their int8 grids (pinned by
    tests/test_quant.py); otherwise introduces the usual <=0.5-ULP-of-scale
    rounding per operand.
    """
    st = _QUANT_STATE
    xf = x.astype(jnp.float32)
    kf = kernel.astype(jnp.float32)
    if st["mode"] == "static":
        if st["idx"] >= len(st["scales"]):
            raise ValueError(
                f"conv_quant: site {st['idx']} has no calibrated scale "
                f"({len(st['scales'])} recorded) — the traced body must "
                "match the calibration body")
        amax = max(float(st["scales"][st["idx"]]), 1e-6)
        st["idx"] += 1
        sx = jnp.float32(amax / 127.0)
    else:
        sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6) / 127.0
    sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    kq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq, kq,
        window_strides=(stride, stride),
        padding="VALID",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMS,
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * sw)


def conv2d(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None,
           stride: int = 1, precision=None, dilation: int = 1) -> jax.Array:
    """VALID conv over an already-padded NHWC input. kernel is HWIO."""
    out_dtype = x.dtype
    if _QUANT_STATE is not None:
        if _QUANT_STATE["mode"] == "record":
            # record EVERY site (indices must line up with the static
            # consumer, which advances one scale per conv call)
            _QUANT_STATE["record"].append(
                jnp.max(jnp.abs(x.astype(jnp.float32))))
        elif (_QUANT_STATE["all"]
              or _quant_worthwhile(x.shape, kernel.shape, stride)):
            y = _conv2d_int8(x, kernel, stride, dilation).astype(out_dtype)
            if bias is not None:
                y = y + bias.astype(out_dtype)
            return y
        elif _QUANT_STATE["mode"] == "static":
            _QUANT_STATE["idx"] += 1  # keep site indices aligned
    if _CONV_DTYPE is not None:
        x = x.astype(_CONV_DTYPE)
        kernel = kernel.astype(_CONV_DTYPE)
    # No preferred_element_type: its transpose rule mixes dtypes under grad.
    # On the MXU bf16 dots accumulate in f32 internally; the output is cast
    # back to the caller dtype so norms/losses stay in f32.
    y = lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding="VALID",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMS,
        precision=precision if precision is not None else _CONV_PRECISION,
    )
    y = y.astype(out_dtype)
    if bias is not None:
        # cast bias to the activation dtype: bf16 + f32 would silently
        # promote EVERY conv output (and the whole downstream chain) to f32
        y = y + bias.astype(out_dtype)
    return y


# ---------------------------------------------------------------------------
# Space-to-depth convolution (small-channel conv rescue)
# ---------------------------------------------------------------------------
#
# A 7x7 conv with 3 input or output channels runs at 1.7-6 TF/s on the MXU
# (measured, tools/convbench.py): N or K is far below the 128-lane width, so
# >95% of the systolic array is padding. Reformulating the conv on an f x f
# space-to-depth grid multiplies the channel dims by f² at the cost of
# phase-sparsity zeros in the rearranged kernel (waste (ceil((k-1+f)/f)·f/k)²
# ≈ 2.9x for k=7, f=4) — a large net win for these layers. The transform is
# EXACT (max |Δ| ~1e-6, tests/test_core_ops.py) and built from the canonical
# [k,k,c,n] kernel at trace time, so autodiff and checkpoints see the
# standard parametrization.


def space_to_depth(x: jax.Array, f: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f,
                                                 f * f * c)


def depth_to_space(x: jax.Array, f: int) -> jax.Array:
    b, h, w, c = x.shape
    n = c // (f * f)
    x = x.reshape(b, h, w, f, f, n)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * f, w * f, n)


def depth_to_space_partial(x: jax.Array, f: int, g: int) -> jax.Array:
    """d2s from f-packed to g-packed form (g divides f): [B,H,W,f²C] →
    [B,H·f/g,W·f/g,g²C]. Phase p of the f-packing splits as
    p = (p//g)·g + p%g — the outer part becomes the finer cell index, the
    inner part the residual g-phase. depth_to_space(x, f) ≡
    depth_to_space_partial(x, f, 1)."""
    b, h, w, c = x.shape
    m = f // g
    n = c // (f * f)
    x = x.reshape(b, h, w, m, g, m, g, n)
    x = x.transpose(0, 1, 3, 2, 5, 4, 6, 7)
    return x.reshape(b, h * m, w * m, g * g * n)


@functools.lru_cache(maxsize=32)
def _s2d_select(f: int, k: int) -> np.ndarray:
    """S[A, p, r, u] = 1 iff kernel tap u maps to s2d tap A at input phase p
    for output phase r (u = f*A + p - r)."""
    span = (f - 1 + k - 1) // f + 1
    s = np.zeros((span, f, f, k), np.float32)
    for a in range(span):
        for p in range(f):
            for r in range(f):
                u = f * a + p - r
                if 0 <= u < k:
                    s[a, p, r, u] = 1.0
    return s


def s2d_rescue_factor(h: int, w: int, k: int, cin: int, cout: int,
                      stride: int, pad: int) -> int:
    """Pick the space-to-depth factor for a conv, or 0 to use the direct
    path. Only stride-1 SAME convs with tiny channel counts benefit
    (measured: stem 7x7 3→64 1.9x at f=4, decoder out 7x7 64→3 2.2x at
    f=8 — tools/convbench.py); everything else loses to XLA's native conv.
    Static shapes → decided at trace time. MUNIT_S2D=0 disables."""
    import os
    if os.environ.get("MUNIT_S2D", "1") != "1":
        return 0
    if stride != 1 or k <= 1 or 2 * pad != k - 1:
        return 0
    if cout <= 8:
        f = 8
    elif cin <= 8:
        f = 4
    else:
        return 0
    while f > 1 and (h % f or w % f):
        f //= 2
    return f if f > 1 else 0


def conv2d_s2d(x: jax.Array, kernel: jax.Array,
               bias: jax.Array | None = None, f: int = 4,
               pad: int | None = None, pad_type: str = "reflect",
               pre=None, post=None) -> jax.Array:
    """Stride-1 odd-kernel conv computed on an f×f space-to-depth grid.

    Exactly equivalent to ``conv2d(pad2d(x, (k-1)//2, pad_type), kernel)``.
    x: NHWC (unpadded); kernel: [k, k, cin, cout]. H, W must be divisible
    by f.

    ``pre``: optional elementwise function applied to the space-to-depth
    slab right before the conv — the hook for cross-layer norm fusion
    (whole-tensor LN is permutation-invariant, so its normalize can run in
    s2d space where the layout is conv-friendly; see whole_ln_stats_s2d).
    The far-side zero rows pass through ``pre`` too, which is safe: no
    nonzero rearranged-kernel tap ever reads them.

    ``post``: optional function applied to the conv output while it is
    still in PACKED form ([B, H/f, W/f, f²·cout], bias already added,
    exact — sliced before any far-side zeros). Spatially
    permutation-invariant consumers (instance-norm statistics, relu) run
    here at full 128-lane occupancy (f²·cout lanes) instead of on the
    half-lane unpacked slab; the depth-to-space unpack moves after.
    """
    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    h, w = x.shape[1], x.shape[2]
    p0 = (k - 1) // 2 if pad is None else pad
    xp = pad2d(x, p0, pad_type)
    e = (-(h + 2 * p0)) % f
    if e:
        # far-side zeros; never touched by a nonzero kernel tap (u >= k)
        xp = jnp.pad(xp, ((0, 0), (0, e), (0, e), (0, 0)))
    xs = space_to_depth(xp, f)
    if pre is not None:
        xs = pre(xs)
    s = jnp.asarray(_s2d_select(f, k), kernel.dtype)
    k2 = jnp.einsum("apru,bqsv,uvcn->abpqcrsn", s, s, kernel)
    span = s.shape[0]
    k2 = k2.reshape(span, span, f * f * cin, f * f * cout)
    y2 = conv2d(xs, k2, None, 1)
    y2 = y2[:, :h // f, :w // f, :]
    if post is not None:
        if bias is not None:
            y2 = y2 + jnp.tile(bias, f * f).astype(y2.dtype)
        return depth_to_space(post(y2), f)
    y = depth_to_space(y2, f)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Normalizations
# ---------------------------------------------------------------------------


def _moments(xf: jax.Array, axes) -> tuple:
    """Single-pass mean/biased-variance: Σx and Σx² in ONE traversal (XLA
    fuses the two reductions), instead of the textbook two-pass
    E[(x-mean)²] which costs an extra full read of x. f32 accumulate keeps
    the E[x²]−mean² cancellation ≤1e-6 for O(1) activations."""
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    mean_sq = jnp.mean(xf * xf, axis=axes, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    return mean, var


def upcast_f32(x: jax.Array) -> jax.Array:
    """Cast to AT LEAST float32: bf16 statistics/losses compute in f32 (the
    production numerics contract), while float64 — the driver dryrun's
    jax_enable_x64 parity leg — passes through without a silent downcast
    that would cap sharded-vs-unsharded gradient parity at f32 noise."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Affine-less instance norm over H,W per (sample, channel).

    Matches torch nn.InstanceNorm2d defaults (biased variance, eps=1e-5).
    x: NHWC. Statistics are computed in (at least) float32.
    """
    xf = upcast_f32(x)
    mean, var = _moments(xf, (1, 2))
    y = (xf - mean) * lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def packed_instance_norm(y2: jax.Array, f: int, cout: int,
                         eps: float = 1e-5, relu: bool = False) -> jax.Array:
    """Instance norm (+optional relu) on a PACKED s2d slab
    [B, H/f, W/f, f²·cout] (phase-major channel order, as produced inside
    conv2d_s2d). Per-channel statistics over (H, W) pixel space equal
    statistics over (cells, phases) of the packed form — spatial
    permutation invariance — so the norm runs at full f²·cout lane
    occupancy instead of on the half-lane unpacked slab. Every full-slab
    pass stays packed; only the [B, f²·cout] partial sums get the tiny
    phase reduction. Exact vs instance_norm(depth_to_space(y2, f)) up to
    f32 summation association."""
    b, hh, ww, cpk = y2.shape
    yf = upcast_f32(y2)
    s1 = jnp.sum(yf, axis=(1, 2))
    s2 = jnp.sum(yf * yf, axis=(1, 2))
    n = hh * ww * f * f
    s1c = s1.reshape(b, f * f, cout).sum(1)
    s2c = s2.reshape(b, f * f, cout).sum(1)
    mean = s1c / n
    var = jnp.maximum(s2c / n - mean * mean, 0.0)
    scale = lax.rsqrt(var + eps)
    mt = jnp.tile(mean, (1, f * f))[:, None, None, :]
    st = jnp.tile(scale, (1, f * f))[:, None, None, :]
    z = (yf - mt) * st
    if relu:
        z = jnp.maximum(z, 0.0)
    return z.astype(y2.dtype)


def adain(x: jax.Array, gamma: jax.Array, beta: jax.Array,
          eps: float = 1e-5) -> jax.Array:
    """Adaptive instance norm: instance-normalize then scale/shift per sample.

    x: NHWC; gamma, beta: (B, C) produced by the style MLP. Equivalent to the
    reference's F.batch_norm-over-(1,B*C,H,W) trick with weight=gamma (std) and
    bias=beta (mean) — networks.py:823-845 (training=True → batch statistics,
    biased variance).
    """
    xf = upcast_f32(x)
    mean, var = _moments(xf, (1, 2))
    y = (xf - mean) * lax.rsqrt(var + eps)
    g = upcast_f32(gamma)[:, None, None, :]
    b = upcast_f32(beta)[:, None, None, :]
    return (y * g + b).astype(x.dtype)


def whole_layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                     eps: float = 1e-5) -> jax.Array:
    """The fork's custom LayerNorm (networks.py:851-878).

    Per-sample mean/std over the ENTIRE feature map (all of C,H,W), with the
    *unbiased* (Bessel-corrected) std and eps added to the std itself:
        y = (x - mean) / (std + eps); out = y * gamma[c] + beta[c]
    x: NHWC; gamma, beta: (C,).
    """
    xf = upcast_f32(x)
    n = x.shape[1] * x.shape[2] * x.shape[3]
    mean, var_b = _moments(xf, (1, 2, 3))
    # unbiased std, matching torch.Tensor.std() default (correction=1)
    std = jnp.sqrt(var_b * (n / (n - 1)))
    y = (xf - mean) / (std + eps)
    out = y * upcast_f32(gamma) + upcast_f32(beta)
    return out.astype(x.dtype)


def whole_ln_stats_s2d(y: jax.Array, f: int,
                       eps: float = 1e-5) -> tuple:
    """Per-sample whole-tensor LN statistics computed over a space-to-depth
    VIEW of ``y`` (same elements, different arrangement — the statistics are
    identical, but the reduce runs in the layout the s2d consumer forces on
    this slab anyway, instead of the {3,0,2,1}-pinned full-tensor reduce the
    direct whole_layer_norm suffers there; BENCH.md r2 whole-LN analysis).

    Returns (mean, std+eps) broadcastable over NHWC, with the reference's
    unbiased std + eps-on-std semantics (networks.py:851-878).
    """
    n = y.shape[1] * y.shape[2] * y.shape[3]
    zf = space_to_depth(y, f).astype(jnp.float32)
    s1 = jnp.sum(zf, axis=(1, 2, 3))
    s2 = jnp.sum(zf * zf, axis=(1, 2, 3))
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    std = jnp.sqrt(var * (n / (n - 1)))
    return (mean[:, None, None, None],
            (std + eps)[:, None, None, None])


def batch_norm_inference(x: jax.Array, mean: jax.Array, var: jax.Array,
                         gamma: jax.Array, beta: jax.Array,
                         eps: float = 1e-5) -> jax.Array:
    """Inference-mode batch norm with frozen running stats (for ResNet/VGG/Inception)."""
    xf = x.astype(jnp.float32)
    inv = lax.rsqrt(var.astype(jnp.float32) + eps) * gamma.astype(jnp.float32)
    return ((xf - mean.astype(jnp.float32)) * inv + beta.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pooling / resizing
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _avg_pool_counts(h: int, w: int) -> np.ndarray:
    """Valid-element counts for 3x3 stride-2 pad-1 pooling
    (count_include_pad=False). Pure numpy so it is safe under tracing."""
    padded = np.pad(np.ones((h, w), np.float32), 1)
    oh, ow = (h + 1) // 2, (w + 1) // 2
    counts = np.zeros((oh, ow), np.float32)
    for i in range(oh):
        for j in range(ow):
            counts[i, j] = padded[2 * i:2 * i + 3, 2 * j:2 * j + 3].sum()
    return counts[None, :, :, None]


def avg_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False) on NHWC.

    The multi-scale discriminator's inter-scale downsample (networks.py:32-34).
    Zero-padded sum pool divided by the per-position count of valid elements.
    """
    s = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    counts = jnp.asarray(_avg_pool_counts(x.shape[1], x.shape[2]))
    return (s / counts).astype(x.dtype)


def max_pool(x: jax.Array, window: int, stride: int, padding: int = 0) -> jax.Array:
    """Max pool on NHWC (for VGG16 / ResNet stems)."""
    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max, (1, window, window, 1), (1, stride, stride, 1), pads)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d(1): mean over H,W → (B,1,1,C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbor 2x upsample on NHWC (nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def resize_bilinear(x: jax.Array, size: tuple[int, int],
                    align_corners: bool = False) -> jax.Array:
    """Bilinear resize on NHWC matching torch F.interpolate(mode='bilinear').

    align_corners=False matches torch's default (half-pixel centers), which is
    jax.image.resize('linear'). align_corners=True is used by the reference's
    segmenter upsample (resnet.py) and is implemented via explicit gather.
    """
    b, h, w, c = x.shape
    nh, nw = size
    if not align_corners:
        return jax.image.resize(x, (b, nh, nw, c), method="linear")
    if h == nh and w == nw:
        return x

    def axis_coords(n_out, n_in):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        scale = (n_in - 1) / (n_out - 1)
        return jnp.arange(n_out, dtype=jnp.float32) * scale

    ys = axis_coords(nh, h)
    xs = axis_coords(nw, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]
    g = x.astype(jnp.float32)
    top = g[:, y0][:, :, x0] * (1 - wx) + g[:, y0][:, :, x1] * wx
    bot = g[:, y1][:, :, x0] * (1 - wx) + g[:, y1][:, :, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest resize on NHWC (torch F.interpolate default mode='nearest')."""
    b, h, w, c = x.shape
    nh, nw = size
    iy = jnp.floor(jnp.arange(nh, dtype=jnp.float32) * (h / nh)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(nw, dtype=jnp.float32) * (w / nw)).astype(jnp.int32)
    return x[:, jnp.clip(iy, 0, h - 1)][:, :, jnp.clip(ix, 0, w - 1)]


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def activation(name: str):
    """Activation factory matching networks.py:667-681 (parameter-free subset)."""
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "selu":
        return jax.nn.selu
    if name == "tanh":
        return jnp.tanh
    if name == "none":
        return lambda x: x
    raise ValueError(f"Unsupported activation: {name}")
