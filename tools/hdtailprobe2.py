"""Exact packed tail (core/packed_tail.py) vs production, at HD shapes.

Also bisects the XLA fusion-emitter crash seen when the integrated packed
tail compiles under the full HD train step (window_bounds 3 vs 9 check
failure): run the exact tail standalone, then under jax.checkpoint, to
find the trigger.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/hdtailprobe2.py
"""

import os
import time

import numpy as np

K = int(os.environ.get("BENCH_K", "2"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
B = int(os.environ.get("BENCH_BATCH", "8"))
H = int(os.environ.get("BENCH_H", "256"))  # source (pre-upsample) size
MODE = os.environ.get("PROBE_MODE", "all")  # plain | remat | all


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.core import ops
    from munit_tpu.core.packed_tail import packed_decoder_tail
    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)

    cin, cmid, cout = 128, 64, 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, cin), jnp.bfloat16)
    k5 = jnp.asarray(rng.randn(5, 5, cin, cmid) * 0.05, jnp.float32)
    b5 = jnp.asarray(rng.randn(cmid) * 0.01, jnp.float32)
    gamma = jnp.asarray(rng.rand(cmid), jnp.float32)
    beta = jnp.asarray(0.01 * rng.randn(cmid), jnp.float32)
    k7 = jnp.asarray(rng.randn(7, 7, cmid, cout) * 0.05, jnp.float32)
    b7 = jnp.asarray(rng.randn(cout) * 0.01, jnp.float32)
    kern1 = jnp.asarray(rng.randn(1, 1, cout, cin) * 0.3, jnp.bfloat16)

    def tail_v0(t):
        u = ops.upsample_nearest(t, 2)
        y = ops.conv2d(ops.pad2d(u, 2, "reflect"), k5, b5, 1)
        z = jax.nn.relu(ops.whole_layer_norm(y, gamma, beta))
        return ops.conv2d(ops.pad2d(z, 3, "reflect"), k7, b7, 1)

    def tail_v1(t):
        return packed_decoder_tail(t, k5, b5, gamma, beta, k7, b7, "relu")

    va = jax.jit(tail_v0)(x)
    vb = jax.jit(tail_v1)(x)
    d = float(jnp.max(jnp.abs(va.astype(jnp.float32)
                              - vb.astype(jnp.float32))))
    print(f"FULL-tensor parity max|d| = {d:.2e} (bf16 chain)", flush=True)

    def chain_time(name, tail, k=K, reps=REPS, remat=False):
        body = jax.checkpoint(tail) if remat else tail

        def loss(t):
            for _ in range(k):
                out = body(t)
                t = ops.conv2d(out, kern1, None, 2)
            return jnp.sum(t.astype(jnp.float32) ** 2)
        gfn = jax.jit(jax.grad(loss))
        r = gfn(x); float(r[0, 0, 0, 0])
        r = gfn(x); float(r[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(reps):
            r = gfn(x)
        float(r[0, 0, 0, 0])
        dt = (time.time() - t0) / (reps * k) * 1e3
        print(f"{name:28s} {dt:8.2f} ms/block", flush=True)
        return dt

    if MODE in ("plain", "all"):
        chain_time("v1 exact packed", tail_v1)
        chain_time("v0 production", tail_v0)
    if MODE in ("remat", "all"):
        chain_time("v1 exact packed + remat", tail_v1, remat=True)
        chain_time("v0 production + remat", tail_v0, remat=True)


if __name__ == "__main__":
    main()
