"""Lane-packed HD decoder tail (exact).

The decoder's last up stage (reference networks.py:515-563: 2x nearest
upsample -> 5x5 conv -> whole-LN -> act -> 7x7 out conv) materializes
[B,2H,2W,64]-shaped tensors whose 64 channels waste half of every 128-lane
TPU register, and the s2d-f8 out conv moves full-resolution slabs through
{3,0,2,1} transposes. This module keeps the WHOLE tail packed in
space-to-depth f=2 form ([B,H,W,256], lane-full):

  1. The 2x-upsample + 5x5 conv collapses into ONE 3x3 conv on the
     un-upsampled input with 4x output channels (one block per output
     phase (r,s)): nearest-upsample duplicates source pixels, so each
     output phase's 5 kernel taps collapse onto 3 source taps.
  2. The whole-tensor LN is permutation-invariant, so its stats,
     normalize and activation run directly in packed space (gamma/beta
     tiled x4, matching the s2d channel order).
  3. The 7x7 out conv consumes the packed form via a further s2d f=4
     (f=8 total): the kernel is zero-extended to k'=8 (alignment only,
     zero extra MACs reach nonzero weights), rearranged with the
     standard select-matrix construction (ops._s2d_select), and its
     input-channel axis permuted from f8-phase order to the packed
     (f4-phase, f2-phase) order.

Border exactness: the phase-collapsed conv is wrong on the 1-cell border
ring (the upsampled-pixel reflect pad is not expressible at source
granularity) and the packed out conv is wrong on a 3-pixel ring (cell-
granularity reflect pad). Both rings are overwritten with exact strips
computed by tiny pixel-space convs on the edge slices — O(edge) work vs
the O(area) interior, so the packed interior win survives.

Measured (tools/hdtailprobe.py, HD 512-out shapes, batch 8, under grad):
packed 21.5 vs production 51.7 ms/block (2.4x) with approximate borders;
the exact strips here add only edge-proportional work.

Equivalent reference chain (Decoder.__call__ last stage):
    u = upsample_nearest(x, 2)
    y = conv2d(pad2d(u, 2, 'reflect'), k5, b5)
    z = act(whole_layer_norm(y, gamma, beta))
    out = conv2d(pad2d(z, 3, 'reflect'), k7, b7)     # pre-tanh
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name

from munit_tpu.core import ops

_EPS = 1e-5


def supported(h_src: int, w_src: int, k_up: int = 5, k_out: int = 7) -> bool:
    """Shapes/kernels the packed tail handles: 5x5 up conv, 7x7 out conv,
    source dims divisible by 4 (s2d f=4 on the f2-packed, pad-2-cell form)
    and large enough that the exact border strips don't overlap the
    interior slices."""
    return (k_up == 5 and k_out == 7
            and h_src % 4 == 0 and w_src % 4 == 0
            and h_src >= 8 and w_src >= 8)


@functools.lru_cache(maxsize=4)
def _phase_selectors():
    """Selectors S[r][a, u]: output phase r of the (2x nearest upsample +
    pad-2 5x5 conv) chain taps source offset a in {-1,0,1} for kernel tap
    u in 0..4 (upsampled tap j-2+u collapses to source floor((j-2+u)/2),
    j = 2i + r)."""
    s0 = np.array([[1, 1, 0, 0, 0],
                   [0, 0, 1, 1, 0],
                   [0, 0, 0, 0, 1]], np.float32)
    s1 = np.array([[1, 0, 0, 0, 0],
                   [0, 1, 1, 0, 0],
                   [0, 0, 0, 1, 1]], np.float32)
    return s0, s1


def phase_collapse_kernel(k5: jax.Array) -> jax.Array:
    """[5,5,cin,cmid] up-conv kernel -> [3,3,cin,4*cmid] phase-collapsed
    kernel; output channel blocks ordered (r, s) row-phase-major, matching
    space_to_depth(., 2) channel order."""
    s0, s1 = _phase_selectors()
    sel = (jnp.asarray(s0), jnp.asarray(s1))
    kf = k5.astype(jnp.float32)
    blocks = [jnp.einsum("at,bu,tuio->abio", sel[r], sel[s], kf,
                         precision=lax.Precision.HIGHEST)
              for r in range(2) for s in range(2)]
    return jnp.concatenate(blocks, axis=-1)


@functools.lru_cache(maxsize=4)
def _packed_out_perm(cmid: int) -> np.ndarray:
    """Input-channel permutation taking the f8 select kernel's (p8, q8, c)
    channel order to the packed (p4, q4, 2r+s, c) order of
    s2d(f=4) o s2d(f=2), with p8 = 2*p4 + r, q8 = 2*q4 + s."""
    perm = np.empty(64 * cmid, np.int64)
    for p4 in range(4):
        for q4 in range(4):
            for r in range(2):
                for s in range(2):
                    p8, q8 = 2 * p4 + r, 2 * q4 + s
                    src = (p8 * 8 + q8) * cmid
                    dst = ((p4 * 4 + q4) * 4 + (2 * r + s)) * cmid
                    perm[dst:dst + cmid] = np.arange(src, src + cmid)
    return perm


def packed_out_kernel(k7: jax.Array) -> jax.Array:
    """[7,7,cmid,cout] out-conv kernel -> [2,2,64*cmid,64*cout] select
    kernel consuming the packed (f2 then f4) layout. The k->8 zero
    extension shifts alignment so the required pad is 4 px = 2 f2-cells;
    no nonzero tap ever reads the extra pad pixel."""
    cmid, cout = k7.shape[2], k7.shape[3]
    k8 = jnp.pad(k7.astype(jnp.float32), ((1, 0), (1, 0), (0, 0), (0, 0)))
    s8 = jnp.asarray(ops._s2d_select(8, 8))
    k2 = jnp.einsum("apru,bqsv,uvcn->abpqcrsn", s8, s8, k8,
                    precision=lax.Precision.HIGHEST)
    span = s8.shape[0]
    k2 = k2.reshape(span, span, 64 * cmid, 64 * cout)
    return jnp.take(k2, jnp.asarray(_packed_out_perm(cmid)), axis=2)


def _pad_w(t: jax.Array, p: int) -> jax.Array:
    """Width-only reflect pad (pixel granularity). Built from unit-width
    slices — no negative-stride (reverse) ops, which participate in the
    TPU fusion-emitter crash this module works around."""
    w = t.shape[2]
    left = [t[:, :, i:i + 1] for i in range(p, 0, -1)]
    right = [t[:, :, w - 2 - i:w - 1 - i] for i in range(p)]
    return jnp.concatenate(left + [t] + right, axis=2)


def _pad_h(t: jax.Array, p: int) -> jax.Array:
    """Height-only reflect pad (pixel granularity); see _pad_w."""
    h = t.shape[1]
    top = [t[:, i:i + 1] for i in range(p, 0, -1)]
    bot = [t[:, h - 2 - i:h - 1 - i] for i in range(p)]
    return jnp.concatenate(top + [t] + bot, axis=1)


def packed_up_block(x: jax.Array,
                    k5: jax.Array, b5: jax.Array,
                    gamma: jax.Array, beta: jax.Array,
                    activ: str = "relu",
                    eps: float = _EPS) -> jax.Array:
    """Exact single packed up stage (the tail's steps 1-3 + unpack):
    upsample-2x -> pad-2 reflect 5x5 conv -> whole-LN -> act computed with
    the phase-collapsed 3x3 conv (36% of the MACs, no upsampled-input
    materialization) and packed-space LN/act, then depth-to-space back to
    pixel form [B, 2H, 2W, cmid]. Used for the decoder's NON-last up
    stages (e.g. up_0 at 256², ~10% of the fused train step), where the
    next consumer needs pixel space."""
    b, hs, ws, _ = x.shape
    cmid = k5.shape[3]
    act = ops.activation(activ)

    kp = phase_collapse_kernel(k5)
    y4 = ops.conv2d(ops.pad2d(x, 1, "reflect"), kp, None, 1)

    # exact 1-cell border ring (see packed_decoder_tail step 2)
    ut = ops.upsample_nearest(x[:, :2], 2)
    ut = jnp.concatenate([ut[:, 2:3], ut[:, 1:2], ut], axis=1)
    y_top = ops.conv2d(_pad_w(ut, 2), k5, None, 1)
    ub = ops.upsample_nearest(x[:, -2:], 2)
    ub = jnp.concatenate([ub, ub[:, 2:3], ub[:, 1:2]], axis=1)
    y_bot = ops.conv2d(_pad_w(ub, 2), k5, None, 1)
    ul = ops.upsample_nearest(x[:, :, :2], 2)
    ul = jnp.concatenate([ul[:, :, 2:3], ul[:, :, 1:2], ul], axis=2)
    y_left = ops.conv2d(_pad_h(ul, 2), k5, None, 1)
    ur = ops.upsample_nearest(x[:, :, -2:], 2)
    ur = jnp.concatenate([ur, ur[:, :, 2:3], ur[:, :, 1:2]], axis=2)
    y_right = ops.conv2d(_pad_h(ur, 2), k5, None, 1)

    p2 = lambda t: ops.space_to_depth(t, 2)
    y4 = jnp.concatenate([p2(y_top), y4[:, 1:-1], p2(y_bot)], axis=1)
    y4 = jnp.concatenate([p2(y_left), y4[:, :, 1:-1], p2(y_right)], axis=2)
    # "pt_slab": the packed-tail working slabs are the largest HD decoder
    # buffers ([B,cells,cells,16*cmid]); the "hd" remat policy recomputes
    # them in the backward (one 3x3 conv + elementwise) instead of storing
    # — the HD K>1 grad-accum enabler (BENCH.md r5). Inert tags without an
    # enclosing jax.checkpoint.
    y4 = checkpoint_name(y4 + jnp.tile(b5, 4).astype(y4.dtype), "pt_slab")

    # whole-LN + act in packed space (permutation-invariant stats)
    n = hs * ws * 4 * cmid
    yf = y4.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(1, 2, 3), keepdims=True)
    s2 = jnp.sum(yf * yf, axis=(1, 2, 3), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    std = jnp.sqrt(var * (n / (n - 1)))
    g4 = jnp.tile(gamma.astype(jnp.float32), 4)
    b4 = jnp.tile(beta.astype(jnp.float32), 4)
    z4 = checkpoint_name(
        act(((yf - mean) / (std + eps) * g4 + b4).astype(y4.dtype)),
        "pt_slab")
    return ops.depth_to_space(z4, 2)


def packed_decoder_tail(x: jax.Array,
                        k5: jax.Array, b5: jax.Array,
                        gamma: jax.Array, beta: jax.Array,
                        k7: jax.Array, b7: jax.Array,
                        activ: str = "relu",
                        eps: float = _EPS) -> jax.Array:
    """Exact lane-packed last-up-stage + out-conv. Returns the PRE-tanh
    out-conv output [B, 2H, 2W, cout]; the caller applies the output
    activation. x: [B, H, W, cin] (the decoder state BEFORE the last 2x
    upsample)."""
    b, hs, ws, _ = x.shape
    cmid = k5.shape[3]
    act = ops.activation(activ)

    # -- 1. phase-collapsed up conv, packed output ------------------------
    kp = phase_collapse_kernel(k5)
    y4 = ops.conv2d(ops.pad2d(x, 1, "reflect"), kp, None, 1)

    # -- 2. exact up-conv border ring (1 cell = 2 px) ---------------------
    # The upsampled-grid reflect pad taps u[-1]=u[1], u[-2]=u[2] — values
    # the source-granularity pad cannot express; recompute the ring with
    # the production formulation on edge slices.
    ut = ops.upsample_nearest(x[:, :2], 2)                      # u rows 0..3
    ut = jnp.concatenate([ut[:, 2:3], ut[:, 1:2], ut], axis=1)  # rows -2..3
    y_top = ops.conv2d(_pad_w(ut, 2), k5, None, 1)              # rows 0..1
    ub = ops.upsample_nearest(x[:, -2:], 2)                     # 2H-4..2H-1
    ub = jnp.concatenate([ub, ub[:, 2:3], ub[:, 1:2]], axis=1)  # ..2H+1
    y_bot = ops.conv2d(_pad_w(ub, 2), k5, None, 1)              # 2H-2..2H-1
    ul = ops.upsample_nearest(x[:, :, :2], 2)
    ul = jnp.concatenate([ul[:, :, 2:3], ul[:, :, 1:2], ul], axis=2)
    y_left = ops.conv2d(_pad_h(ul, 2), k5, None, 1)             # cols 0..1
    ur = ops.upsample_nearest(x[:, :, -2:], 2)
    ur = jnp.concatenate([ur, ur[:, :, 2:3], ur[:, :, 1:2]], axis=2)
    y_right = ops.conv2d(_pad_h(ur, 2), k5, None, 1)            # last 2 cols

    p2 = lambda t: ops.space_to_depth(t, 2)
    y4 = jnp.concatenate([p2(y_top), y4[:, 1:-1], p2(y_bot)], axis=1)
    y4 = jnp.concatenate([p2(y_left), y4[:, :, 1:-1], p2(y_right)], axis=2)
    # "pt_slab": the packed-tail working slabs are the largest HD decoder
    # buffers ([B,cells,cells,16*cmid]); the "hd" remat policy recomputes
    # them in the backward (one 3x3 conv + elementwise) instead of storing
    # — the HD K>1 grad-accum enabler (BENCH.md r5). Inert tags without an
    # enclosing jax.checkpoint.
    y4 = checkpoint_name(y4 + jnp.tile(b5, 4).astype(y4.dtype), "pt_slab")

    # -- 3. whole-LN + activation in packed space -------------------------
    # Permutation-invariant stats (reference networks.py:851-878 semantics:
    # unbiased std, eps on std); gamma/beta tiled to the packed order.
    n = hs * ws * 4 * cmid
    yf = y4.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(1, 2, 3), keepdims=True)
    s2 = jnp.sum(yf * yf, axis=(1, 2, 3), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    std = jnp.sqrt(var * (n / (n - 1)))
    g4 = jnp.tile(gamma.astype(jnp.float32), 4)
    b4 = jnp.tile(beta.astype(jnp.float32), 4)
    # cast-then-activate, matching ConvBlock's whole_layer_norm -> _act order
    z4 = checkpoint_name(
        act(((yf - mean) / (std + eps) * g4 + b4).astype(y4.dtype)),
        "pt_slab")

    # -- 4. packed out conv ----------------------------------------------
    # pad 2 cells (= required pixel pad 3 + the zero-extension row), s2d
    # f=4 on the f2-packed tensor, span-2 select conv, d2s f=8. The cell-
    # granularity pad only influences the 3-px border ring, overwritten
    # exactly below.
    k2p = packed_out_kernel(k7)
    zp = ops.pad2d(z4, 2, "reflect")
    zs = checkpoint_name(ops.space_to_depth(zp, 4), "pt_slab")
    y2 = ops.conv2d(zs, k2p, None, 1)
    out = ops.depth_to_space(y2, 8)                 # [B, 2H, 2W, cout]

    # -- 5. exact out-conv border ring (3 px) -----------------------------
    # NOTE: no reverse (negative-stride slice) ops anywhere in the strip
    # assembly — reverse fused into these strip chains crashes the TPU
    # fusion emitter (fusion_emitter.cc window_bounds==strides check
    # failure); explicit unit slices compile clean. See _pad_w/_pad_h.
    d2 = lambda t: ops.depth_to_space(t, 2)
    z_t = d2(z4[:, :3])                                        # z rows 0..5
    o_top = ops.conv2d(_pad_w(jnp.concatenate(
        [z_t[:, 3:4], z_t[:, 2:3], z_t[:, 1:2], z_t], axis=1), 3),
        k7, None, 1)                                           # rows 0..2
    z_b = d2(z4[:, -3:])                                       # 2H-6..2H-1
    o_bot = ops.conv2d(_pad_w(jnp.concatenate(
        [z_b, z_b[:, 4:5], z_b[:, 3:4], z_b[:, 2:3]], axis=1), 3),
        k7, None, 1)                                           # 2H-3..2H-1
    z_l = d2(z4[:, :, :3])
    o_left = ops.conv2d(_pad_h(jnp.concatenate(
        [z_l[:, :, 3:4], z_l[:, :, 2:3], z_l[:, :, 1:2], z_l], axis=2), 3),
        k7, None, 1)                                           # cols 0..2
    z_r = d2(z4[:, :, -3:])
    o_right = ops.conv2d(_pad_h(jnp.concatenate(
        [z_r, z_r[:, :, 4:5], z_r[:, :, 3:4], z_r[:, :, 2:3]], axis=2), 3),
        k7, None, 1)                                           # last 3 cols

    out = jnp.concatenate([o_top, out[:, 3:-3], o_bot], axis=1)
    out = jnp.concatenate([o_left, out[:, :, 3:-3], o_right], axis=2)
    return out + b7.astype(out.dtype)
