"""Packed-space norm/act for the encoder stems (the cheap variant of the
lane-packing idea stemprobe.py measured negative).

stemprobe v1 lost because it also rewrote the 4x4-s2 down conv as a span-3
select conv (2.25x MACs). This variant changes NOTHING about any conv: the
stem's conv2d_s2d already produces a lane-full packed slab internally
([B,64,64,16*64] at 256^2); instance-norm statistics and relu are spatially
permutation-invariant, so they run in packed space (ops.packed_instance_norm
via the conv2d_s2d ``post`` hook) and the depth-to-space unpack moves after.
Same MACs, same d2s traffic, but the norm/relu passes and their backward run
at 1024-lane instead of 64-lane occupancy. EXACT up to f32 association.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/stemprobe2.py
  BENCH_NORM=none ... (the StyleEncoder stem: relu only)
"""

import os
import time

import numpy as np

K = int(os.environ.get("BENCH_K", "2"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
B = int(os.environ.get("BENCH_BATCH", "16"))   # wide=1 gen forward batch
H = int(os.environ.get("BENCH_H", "256"))
NORM = os.environ.get("BENCH_NORM", "in")      # in | none
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
    f = 4
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

    # v0: production stem (norm/relu on the half-lane unpacked slab)
    def stem_v0(t):
        y = ops.conv2d_s2d(t, k7, b7, f=f, pad=3, pad_type="reflect")
        z = in_relu(y) if NORM == "in" else jnp.maximum(y, 0.0)
        zp = ops.pad2d(z, 1, "reflect")
        return ops.conv2d(zp, k4, b4, 2)

    # v2: identical convs; norm/relu in packed space via the post hook
    if NORM == "in":
        post = lambda y2: ops.packed_instance_norm(y2, f, cmid, relu=True)
    else:
        post = lambda y2: jnp.maximum(y2, 0.0)

    def stem_v2(t):
        z = ops.conv2d_s2d(t, k7, b7, f=f, pad=3, pad_type="reflect",
                           post=post)
        zp = ops.pad2d(z, 1, "reflect")
        return ops.conv2d(zp, k4, b4, 2)

    va = jax.jit(stem_v0)(x)
    vb = jax.jit(stem_v2)(x)
    d = float(jnp.max(jnp.abs(va.astype(jnp.float32) - vb.astype(jnp.float32))))
    print(f"parity max|delta| = {d:.2e} (bf16 chain, norm={NORM})", flush=True)

    def chain_time(name, stem, k=K, reps=REPS):
        def loss(t):
            for _ in range(k):
                out = stem(t)
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
    chain_time("v2 packed-norm stem", stem_v2)
    chain_time("v0 re-measure", stem_v0)


if __name__ == "__main__":
    main()
