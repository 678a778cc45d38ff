"""Encoder-stem lane-packing probe (the r3 follow-up to the packed tail).

HLO cycle attribution of the 114-era steps (tools/hlo_cycles.py) puts the
encoder stems at the top: ContentEncoder/layer_0 fwd+bwd is 14.4% of the
fused dis+gen step and 16.6% of the dis step; StyleEncoder/layer_0 another
~7%/10.6%; ContentEncoder/layer_1 ~3.6%. The chain materializes half-lane
[B,256,256,64] slabs (64 ch in 128 lanes) for the IN/relu and feeds a
native stride-2 4x4 conv.

This probe keeps the whole chain packed in s2d f=2 space:

  v0 (production): conv2d_s2d(7x7 3->64, f=4) -> [B,256,256,64]
                   -> InstanceNorm + relu (half-lane)
                   -> pad 1 reflect -> 4x4 s2 conv 64->128 -> [B,128,128,128]
  v1 (packed):     the same f=4 select conv but with a PARTIAL d2s f4->f2
                   -> [B,128,128,256] (lane-full)
                   -> IN stats over (spatial, 4 phases) per channel +
                      relu in packed space (spatially permutation-invariant)
                   -> 4x4 s2 conv consuming the packed form: a span-3
                      stride-1 select conv whose output grid IS the cell
                      grid -> [B,128,128,128] pixel space, no unpack.

Borders are APPROXIMATE in v1 (cell-granularity zero pad instead of the
1-px reflect) — timing probe; exact border strips (packed_tail style) only
get built if the interior formulation wins.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/stemprobe.py
"""

import os
import time

import numpy as np

K = int(os.environ.get("BENCH_K", "2"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
B = int(os.environ.get("BENCH_BATCH", "16"))   # wide=1 gen forward batch
H = int(os.environ.get("BENCH_H", "256"))
NORM = os.environ.get("BENCH_NORM", "in")      # in | none (style encoder)
_EPS = 1e-5


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.core import ops
    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)

    cin, cmid, cout = 3, 64, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, cin), jnp.bfloat16)
    k7 = jnp.asarray(rng.randn(7, 7, cin, cmid) * 0.05, jnp.float32)
    b7 = jnp.asarray(rng.randn(cmid) * 0.01, jnp.float32)
    k4 = jnp.asarray(rng.randn(4, 4, cmid, cout) * 0.05, jnp.float32)
    b4 = jnp.asarray(rng.randn(cout) * 0.01, jnp.float32)
    k1 = jnp.asarray(rng.randn(1, 1, cout, cin) * 0.3, jnp.bfloat16)

    def in_relu(y):
        yf = y.astype(jnp.float32)
        m = jnp.mean(yf, axis=(1, 2), keepdims=True)
        m2 = jnp.mean(yf * yf, axis=(1, 2), keepdims=True)
        v = jnp.maximum(m2 - m * m, 0.0)
        z = (yf - m) * lax.rsqrt(v + _EPS)
        return jnp.maximum(z, 0.0).astype(y.dtype)

    def relu(y):
        return jnp.maximum(y, 0.0)

    # --- v0: production stem chain ----------------------------------------
    def stem_v0(t):
        y = ops.conv2d_s2d(t, k7, b7, f=4, pad=3, pad_type="reflect")
        z = in_relu(y) if NORM == "in" else relu(y)
        zp = ops.pad2d(z, 1, "reflect")
        return ops.conv2d(zp, k4, b4, 2)

    # --- v1: packed stem chain ----------------------------------------------
    # stem select conv (same as conv2d_s2d f=4) but partial d2s to f=2
    f = 4
    s4 = jnp.asarray(ops._s2d_select(4, 7), jnp.float32)
    k2s = jnp.einsum("apru,bqsv,uvcn->abpqcrsn", s4, s4, k7)
    span4 = s4.shape[0]
    k2s = k2s.reshape(span4, span4, 16 * cin, 16 * cmid)

    # down-conv select: output pixel (i,j) of the stride-2 4x4 pad-1 conv
    # taps pixel 2i+u-1 -> f2 cell (i-1+a), phase r with a=(u-1)//2+1,
    # r=(u-1)%2; one-hot per slot (u unique given (a,r)) -> exact scatter.
    Sd = np.zeros((3, 2, 4), np.float32)
    for u in range(4):
        Sd[(u - 1) // 2 + 1, (u - 1) % 2, u] = 1.0
    sd = jnp.asarray(Sd)
    kd = jnp.einsum("aru,bsv,uvco->abrsco", sd, sd, k4)
    kd = kd.reshape(3, 3, 4 * cmid, cout)

    def stem_v1(t):
        xp = ops.pad2d(t, 3, "reflect")
        e = (-(H + 6)) % f
        if e:
            xp = jnp.pad(xp, ((0, 0), (0, e), (0, e), (0, 0)))
        xs = ops.space_to_depth(xp, f)
        y2 = ops.conv2d(xs, k2s.astype(t.dtype), None, 1)
        y2 = y2[:, :H // f, :H // f, :]
        y4 = ops.depth_to_space_partial(y2, 4, 2)       # [B,H/2,W/2,4*cmid]
        y4 = y4 + jnp.tile(b7, 4).astype(y4.dtype)
        if NORM == "in":
            b_, hh, ww, _ = y4.shape
            yv = y4.reshape(b_, hh, ww, 4, cmid).astype(jnp.float32)
            m = jnp.mean(yv, axis=(1, 2, 3), keepdims=True)
            m2 = jnp.mean(yv * yv, axis=(1, 2, 3), keepdims=True)
            v = jnp.maximum(m2 - m * m, 0.0)
            zv = jnp.maximum((yv - m) * lax.rsqrt(v + _EPS), 0.0)
            z4 = zv.reshape(b_, hh, ww, 4 * cmid).astype(y4.dtype)
        else:
            z4 = relu(y4)
        zp = jnp.pad(z4, ((0, 0), (1, 1), (1, 1), (0, 0)))  # approx border
        y = ops.conv2d(zp, kd.astype(t.dtype), None, 1)     # [B,H/2,W/2,cout]
        return y + b4.astype(y.dtype)

    # interior parity check (borders approximate by design)
    va = jax.jit(stem_v0)(x)
    vb = jax.jit(stem_v1)(x)
    m = 4
    d = float(jnp.max(jnp.abs(
        va[:, m:-m, m:-m, :].astype(jnp.float32)
        - vb[:, m:-m, m:-m, :].astype(jnp.float32))))
    print(f"interior parity max|delta| = {d:.2e} (bf16 chain, norm={NORM})",
          flush=True)

    def chain_time(name, stem, k=K, reps=REPS):
        def loss(t):
            for _ in range(k):
                out = stem(t)                       # [B,H/2,W/2,cout]
                t = ops.upsample_nearest(ops.conv2d(out, k1, None, 1), 2)
            return jnp.sum(t.astype(jnp.float32) ** 2)
        gfn = jax.jit(jax.grad(loss))
        r = gfn(x); float(r[0, 0, 0, 0])
        r = gfn(x); float(r[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(reps):
            r = gfn(x)
        float(r[0, 0, 0, 0])
        dt = (time.time() - t0) / (reps * k) * 1e3
        print(f"{name:24s} {dt:8.2f} ms/block", flush=True)
        return dt

    chain_time("v0 production stem", stem_v0)
    chain_time("v1 packed stem", stem_v1)
    chain_time("v0 re-measure", stem_v0)


if __name__ == "__main__":
    main()
