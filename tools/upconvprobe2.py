"""up_0 packed-up-block probe (post-packed-tail follow-up).

The 114-era HLO attribution (tools/hlo_cycles.py) puts decoder up_0 at
~10% of the fused step (bwd reduce 26.4M + bwd conv 20.6M + fwd conv
10.0M + convert 5.7M of 590M cycles). packed_tail.packed_up_block applies
the tail's phase-collapse to a single NON-last up stage: one 3x3 conv
with 4x out channels (36% of the MACs, no [B,2H,2W,cin] upsampled-input
materialization), LN+act in packed space, then an unpack (the next
consumer — up_1's packed tail — needs pixel space).

r2's tools/upconvprobe.py measured the phase-DECOMPOSED formulation (4
separate convs + interleave) negative; this is the single-conv packed
formulation that won at the tail.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/upconvprobe2.py
"""

import os
import time

import numpy as np

K = int(os.environ.get("BENCH_K", "2"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
B = int(os.environ.get("BENCH_BATCH", "16"))   # wide=1 gen forward batch
H = int(os.environ.get("BENCH_H", "64"))       # up_0 source at 256² config
CIN = int(os.environ.get("BENCH_CIN", "256"))
_EPS = 1e-5


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.core import ops, packed_tail as pt
    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)

    cmid = CIN // 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, CIN), jnp.bfloat16)
    k5 = jnp.asarray(rng.randn(5, 5, CIN, cmid) * 0.05, jnp.float32)
    b5 = jnp.asarray(rng.randn(cmid) * 0.01, jnp.float32)
    g = jnp.asarray(rng.rand(cmid) + 0.2, jnp.float32)
    bb = jnp.asarray(0.1 * rng.randn(cmid), jnp.float32)
    # downstream consumer standing in for up_1's packed conv: 3x3 s2 back
    # to the source grid so the chain can loop
    kd = jnp.asarray(rng.randn(3, 3, cmid, CIN) * 0.05, jnp.bfloat16)

    def whole_ln_act(y):
        yf = y.astype(jnp.float32)
        n = yf.size // yf.shape[0]
        m = jnp.mean(yf, axis=(1, 2, 3), keepdims=True)
        m2 = jnp.mean(yf * yf, axis=(1, 2, 3), keepdims=True)
        v = jnp.maximum(m2 - m * m, 0.0)
        std = jnp.sqrt(v * (n / (n - 1)))
        z = (yf - m) / (std + _EPS) * g + bb
        return jnp.maximum(z, 0.0).astype(y.dtype)

    def up_v0(t):
        u = ops.upsample_nearest(t, 2)
        y = ops.conv2d(ops.pad2d(u, 2, "reflect"), k5, b5, 1)
        return whole_ln_act(y)

    def up_v1(t):
        return pt.packed_up_block(t, k5, b5, g, bb, activ="relu")

    va = jax.jit(up_v0)(x)
    vb = jax.jit(up_v1)(x)
    d = float(jnp.max(jnp.abs(va.astype(jnp.float32) - vb.astype(jnp.float32))))
    print(f"parity max|delta| = {d:.2e} (bf16 chain)", flush=True)

    def chain_time(name, up, k=K, reps=REPS):
        def loss(t):
            for _ in range(k):
                z = up(t)                                   # [B,2H,2W,cmid]
                t = ops.conv2d(ops.pad2d(z, 1, "zero"), kd, None, 2)
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

    chain_time("v0 production up_0", up_v0)
    chain_time("v1 packed up block", up_v1)
    chain_time("v0 re-measure", up_v0)


if __name__ == "__main__" and not os.environ.get("PROBE_DUS"):
    main()


def _dus_variant():
    """v2: packed_up_block with the border-strip concats replaced by
    dynamic_update_slice (XLA can update in place instead of rewriting the
    whole slab through two concatenates; the backward turns concat-bwd
    full splits into one select + small slices)."""
    import jax.numpy as jnp
    from jax import lax
    from munit_tpu.core import ops
    from munit_tpu.core.packed_tail import (phase_collapse_kernel,
                                            _pad_w, _pad_h)

    def packed_up_dus(x, k5, b5, gamma, beta, eps=1e-5):
        b, hs, ws, _ = x.shape
        cmid = k5.shape[3]
        kp = phase_collapse_kernel(k5)
        y4 = ops.conv2d(ops.pad2d(x, 1, "reflect"), kp, None, 1)

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
        z = lambda t: t.astype(y4.dtype)
        y4 = lax.dynamic_update_slice(y4, z(p2(y_top)), (0, 0, 0, 0))
        y4 = lax.dynamic_update_slice(y4, z(p2(y_bot)), (0, hs - 1, 0, 0))
        y4 = lax.dynamic_update_slice(y4, z(p2(y_left)), (0, 0, 0, 0))
        y4 = lax.dynamic_update_slice(y4, z(p2(y_right)), (0, 0, ws - 1, 0))
        y4 = y4 + jnp.tile(b5, 4).astype(y4.dtype)

        n = hs * ws * 4 * cmid
        yf = y4.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=(1, 2, 3), keepdims=True)
        s2 = jnp.sum(yf * yf, axis=(1, 2, 3), keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        std = jnp.sqrt(var * (n / (n - 1)))
        g4 = jnp.tile(gamma.astype(jnp.float32), 4)
        b4 = jnp.tile(beta.astype(jnp.float32), 4)
        z4 = jnp.maximum((yf - mean) / (std + eps) * g4 + b4, 0.0)
        return ops.depth_to_space(z4.astype(y4.dtype), 2)

    return packed_up_dus


def main2():
    import jax
    import jax.numpy as jnp
    from jax import lax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.core import ops, packed_tail as pt
    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)

    cmid = CIN // 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, CIN), jnp.bfloat16)
    k5 = jnp.asarray(rng.randn(5, 5, CIN, cmid) * 0.05, jnp.float32)
    b5 = jnp.asarray(rng.randn(cmid) * 0.01, jnp.float32)
    g = jnp.asarray(rng.rand(cmid) + 0.2, jnp.float32)
    bb = jnp.asarray(0.1 * rng.randn(cmid), jnp.float32)
    kd = jnp.asarray(rng.randn(3, 3, cmid, CIN) * 0.05, jnp.bfloat16)

    up_v1 = lambda t: pt.packed_up_block(t, k5, b5, g, bb, activ="relu")
    dus = _dus_variant()
    up_v2 = lambda t: dus(t, k5, b5, g, bb)

    va = jax.jit(up_v1)(x)
    vb = jax.jit(up_v2)(x)
    d = float(jnp.max(jnp.abs(va.astype(jnp.float32) - vb.astype(jnp.float32))))
    print(f"v1-v2 parity max|delta| = {d:.2e}", flush=True)

    import time as _t

    def chain_time(name, up, k=K, reps=REPS):
        def loss(t):
            for _ in range(k):
                zz = up(t)
                t = ops.conv2d(ops.pad2d(zz, 1, "zero"), kd, None, 2)
            return jnp.sum(t.astype(jnp.float32) ** 2)
        gfn = jax.jit(jax.grad(loss))
        r = gfn(x); float(r[0, 0, 0, 0])
        r = gfn(x); float(r[0, 0, 0, 0])
        t0 = _t.time()
        for _ in range(reps):
            r = gfn(x)
        float(r[0, 0, 0, 0])
        dt = (_t.time() - t0) / (reps * k) * 1e3
        print(f"{name:24s} {dt:8.2f} ms/block", flush=True)
        return dt

    chain_time("v1 packed concat", up_v1)
    chain_time("v2 packed DUS", up_v2)
    chain_time("v1 re-measure", up_v1)


if __name__ == "__main__" and os.environ.get("PROBE_DUS"):
    main2()
