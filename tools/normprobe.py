"""Probe whole-LayerNorm implementations on the TPU.

The r2 trace shows the decoder's whole-tensor LN stats as the largest
non-conv ops in the train step (4.47 ms on bf16[16,256,256,64] — ~60 GB/s
effective vs ~800 GB/s HBM). Methodology: K-unrolled single-dispatch
chains (y_{k+1} = f(y_k)) with a 4-byte scalar fetch — per-call isolated
timings over the axon tunnel are dominated by dispatch + output fetch
(BENCH.md).

  PYTHONPATH=/root/.axon_site:/root/repo python tools/normprobe.py
"""

import functools
import os
import time

import numpy as np

K = int(os.environ.get("BENCH_K", "10"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
SHAPES = [(16, 256, 256, 64), (16, 128, 128, 128), (8, 256, 256, 64)]
_EPS = 1e-5


def main():
    import jax
    import jax.numpy as jnp
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.core import ops

    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        has_pallas = True
    except Exception:
        has_pallas = False

    def chain_time(name, f, x, k=K, reps=REPS):
        """time of one application, amortized over a K-chain."""
        def chained(x_):
            y = x_
            for _ in range(k):
                y = f(y)
            return y[0, 0, 0, 0].astype(jnp.float32)
        jfn = jax.jit(chained)
        float(jfn(x))  # compile
        float(jfn(x))
        t0 = time.time()
        for _ in range(reps):
            s = jfn(x)
        float(s)
        dt = (time.time() - t0) / (reps * k)
        print(f"  {name:46s} {dt * 1e3:8.3f} ms/app", flush=True)
        return dt

    for shape in SHAPES:
        b, h, w, c = shape
        nbytes = int(np.prod(shape)) * 2
        print(f"\n=== {shape} (bf16, {nbytes / 1e6:.0f} MB) ===")
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        gamma = jnp.asarray(rng.rand(c), jnp.float32)
        beta = jnp.asarray(0.01 * rng.randn(c), jnp.float32)

        chain_time("id+scale (dispatch/BW floor)", lambda t: t * 1.0009, x)

        chain_time("v0 whole_layer_norm (current)",
                   lambda t: ops.whole_layer_norm(t, gamma, beta), x)

        def v1(x_):
            xf = x_.astype(jnp.float32)
            s1 = jnp.sum(xf, axis=(1, 2))           # (B, C) lane-preserving
            s2 = jnp.sum(xf * xf, axis=(1, 2))
            s1 = jnp.sum(s1, axis=1)
            s2 = jnp.sum(s2, axis=1)
            n = h * w * c
            mean = (s1 / n)[:, None, None, None]
            var = jnp.maximum(s2 / n - (s1 / n) ** 2, 0.0)
            std = jnp.sqrt(var * (n / (n - 1)))[:, None, None, None]
            y = (xf - mean) / (std + _EPS)
            return (y * gamma + beta).astype(x_.dtype)
        chain_time("v1 per-channel-first stats", v1, x)

        if not (has_pallas and 128 % c == 0 and (w * c) % 128 == 0):
            continue

        wl = w * c // 128   # lane-flattened view (B, H, WL, 128)
        th = h
        while th * wl * 128 * 4 > 2 * 1024 * 1024 and th % 2 == 0:
            th //= 2
        t = h // th
        g128 = jnp.tile(gamma, 128 // c)
        b128 = jnp.tile(beta, 128 // c)

        def _stats_kernel(x_ref, o_ref):
            xf = x_ref[0].astype(jnp.float32)
            o_ref[0, 0, 0, 0] = jnp.sum(xf)
            o_ref[0, 0, 0, 1] = jnp.sum(xf * xf)

        def pallas_stats(xv):
            parts = pl.pallas_call(
                _stats_kernel,
                out_shape=jax.ShapeDtypeStruct((b, t, 1, 2), jnp.float32),
                grid=(b, t),
                in_specs=[pl.BlockSpec((1, th, wl, 128),
                                       lambda i, j: (i, j, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 1, 1, 2), lambda i, j: (i, j, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(xv)
            return parts[:, :, 0, 0].sum(1), parts[:, :, 0, 1].sum(1)

        def v2(x_):
            xv = x_.reshape(b, h, wl, 128)
            s1, s2 = pallas_stats(xv)
            n = h * w * c
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            std = jnp.sqrt(var * (n / (n - 1)))
            xf = x_.astype(jnp.float32)
            y = (xf - mean[:, None, None, None]) / (
                (std + _EPS)[:, None, None, None])
            return (y * gamma + beta).astype(x_.dtype)
        d2 = chain_time("v2 pallas stats + jnp apply", v2, x)

        def _apply_kernel(x_ref, st_ref, g_ref, b_ref, o_ref):
            i = pl.program_id(0)
            xf = x_ref[0].astype(jnp.float32)
            y = (xf - st_ref[i, 0]) * st_ref[i, 1]
            o_ref[0] = (y * g_ref[...] + b_ref[...]).astype(o_ref.dtype)

        def v3(x_):
            xv = x_.reshape(b, h, wl, 128)
            s1, s2 = pallas_stats(xv)
            n = h * w * c
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            std = jnp.sqrt(var * (n / (n - 1)))
            stats = jnp.stack([mean, 1.0 / (std + _EPS)], axis=1)
            yv = pl.pallas_call(
                _apply_kernel,
                out_shape=jax.ShapeDtypeStruct(xv.shape, x_.dtype),
                grid=(b, t),
                in_specs=[
                    pl.BlockSpec((1, th, wl, 128), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, th, wl, 128),
                                       lambda i, j: (i, j, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(xv, stats, jnp.broadcast_to(g128, (wl, 128)),
              jnp.broadcast_to(b128, (wl, 128)))
            return yv.reshape(shape)
        chain_time("v3 pallas stats + pallas apply", v3, x)

        ref = np.asarray(ops.whole_layer_norm(x, gamma, beta), np.float32)
        for name, f in (("v2", v2), ("v3", v3)):
            got = np.asarray(f(x), np.float32)
            print(f"     ({name} max abs err vs v0: "
                  f"{np.max(np.abs(ref - got)):.2e})")


if __name__ == "__main__":
    main()
