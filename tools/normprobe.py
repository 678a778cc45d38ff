"""Probe whole-LayerNorm implementations on the TPU.

The r2 trace shows the decoder's whole-tensor LN stats as the largest
non-conv ops in the train step (4.47 ms on bf16[16,256,256,64] — ~30 GB/s
effective vs ~800 GB/s HBM). This probes stats/normalize variants in
isolation to find a speed-of-light implementation.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/normprobe.py
"""

import functools
import os
import time

import numpy as np

REPS = int(os.environ.get("BENCH_REPS", "30"))
SHAPES = [(16, 256, 256, 64), (16, 128, 128, 128), (8, 256, 256, 64)]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
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

    def timeit(name, fn, *args, reps=REPS):
        jfn = jax.jit(fn)
        out = jfn(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        float(np.asarray(jax.tree.leaves(jfn(*args))[0]).reshape(-1)[0])
        t0 = time.time()
        for _ in range(reps):
            out = jfn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        dt = (time.time() - t0) / reps
        print(f"  {name:46s} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    for shape in SHAPES:
        b, h, w, c = shape
        nbytes = np.prod(shape) * 2
        print(f"\n=== {shape} (bf16, {nbytes / 1e6:.0f} MB) ===")
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        gamma = jnp.asarray(rng.rand(c), jnp.float32)
        beta = jnp.asarray(rng.randn(c), jnp.float32)

        # v0: current implementation
        timeit("v0 whole_layer_norm (current)",
               lambda x_: ops.whole_layer_norm(x_, gamma, beta), x)

        # v1: stats by chained partial reduces (H, then W, then C)
        def v1(x_):
            xf = x_.astype(jnp.float32)
            s1 = jnp.sum(xf, axis=1)
            s2 = jnp.sum(xf * xf, axis=1)
            s1 = jnp.sum(s1, axis=(1, 2))
            s2 = jnp.sum(s2, axis=(1, 2))
            n = h * w * c
            mean = (s1 / n)[:, None, None, None]
            var = jnp.maximum(s2 / n - (s1 / n) ** 2, 0.0)
            std = jnp.sqrt(var * (n / (n - 1)))[:, None, None, None]
            y = (xf - mean) / (std + 1e-5)
            return (y * gamma + beta).astype(x_.dtype)
        timeit("v1 chained partial reduces", v1, x)

        # v2: stats via reshape to (B, HWC)
        def v2(x_):
            xf = x_.astype(jnp.float32).reshape(b, -1)
            n = h * w * c
            s1 = jnp.sum(xf, axis=1)
            s2 = jnp.sum(xf * xf, axis=1)
            mean = (s1 / n)
            var = jnp.maximum(s2 / n - mean ** 2, 0.0)
            std = jnp.sqrt(var * (n / (n - 1)))
            y = (xf - mean[:, None]) / (std[:, None] + 1e-5)
            return (y.reshape(shape) * gamma + beta).astype(x_.dtype)
        timeit("v2 reshape (B,HWC) reduce", v2, x)

        # v3: bf16 partial reduce over H first (accumulate f32 after)
        def v3(x_):
            s1 = jnp.sum(x_, axis=1, dtype=jnp.float32)
            s2 = jnp.sum(x_.astype(jnp.float32) ** 2, axis=1)
            s1 = jnp.sum(s1, axis=(1, 2))
            s2 = jnp.sum(s2, axis=(1, 2))
            n = h * w * c
            mean = (s1 / n)[:, None, None, None]
            var = jnp.maximum(s2 / n - (s1 / n) ** 2, 0.0)
            std = jnp.sqrt(var * (n / (n - 1)))[:, None, None, None]
            y = (x_.astype(jnp.float32) - mean) / (std + 1e-5)
            return (y * gamma + beta).astype(x_.dtype)
        timeit("v3 dtype-hint partial reduces", v3, x)

        # v4: stats only (current moments) — isolates stats vs apply cost
        def v4(x_):
            xf = x_.astype(jnp.float32)
            return ops._moments(xf, (1, 2, 3))
        timeit("v4 stats only (current)", v4, x)

        if has_pallas:
            th = h
            while th * w * c * 4 > 1 * 1024 * 1024 and th % 2 == 0:
                th //= 2
            t = h // th

            def _stats_kernel(x_ref, o_ref):
                xf = x_ref[0].astype(jnp.float32)
                o_ref[0, 0, 0] = jnp.sum(xf)
                o_ref[0, 0, 1] = jnp.sum(xf * xf)

            def _apply_kernel(x_ref, st_ref, g_ref, b_ref, o_ref):
                i = pl.program_id(0)
                xf = x_ref[0].astype(jnp.float32)
                mean = st_ref[i, 0]
                rstd = st_ref[i, 1]
                y = (xf - mean) * rstd
                o_ref[0] = (y * g_ref[...] + b_ref[...]).astype(o_ref.dtype)

            def v5(x_):
                parts = pl.pallas_call(
                    _stats_kernel,
                    out_shape=jax.ShapeDtypeStruct((b, t, 2), jnp.float32),
                    grid=(b, t),
                    in_specs=[pl.BlockSpec((1, th, w, c),
                                           lambda i, j: (i, j, 0, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((1, 1, 2),
                                           lambda i, j: (i, j, 0),
                                           memory_space=pltpu.VMEM),
                )(x_)
                n = h * w * c
                s1 = jnp.sum(parts[:, :, 0], axis=1)
                s2 = jnp.sum(parts[:, :, 1], axis=1)
                mean = s1 / n
                var = jnp.maximum(s2 / n - mean * mean, 0.0)
                std = jnp.sqrt(var * (n / (n - 1)))
                stats = jnp.stack([mean, 1.0 / (std + 1e-5)], axis=1)
                return pl.pallas_call(
                    _apply_kernel,
                    out_shape=jax.ShapeDtypeStruct(x_.shape, x_.dtype),
                    grid=(b, t),
                    in_specs=[
                        pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, th, w, c),
                                           lambda i, j: (i, j, 0, 0),
                                           memory_space=pltpu.VMEM),
                )(x_, stats, gamma, beta)
            try:
                d5 = timeit("v5 pallas tiled two-pass LN", v5, x)
                ref = np.asarray(ops.whole_layer_norm(x, gamma, beta),
                                 np.float32)
                got = np.asarray(v5(x), np.float32)
                err = np.max(np.abs(ref - got))
                print(f"     (v5 max abs err vs v0: {err:.2e})")
            except Exception as e:
                print(f"  v5 pallas FAILED: {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
