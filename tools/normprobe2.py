"""In-context whole-LN probe: conv5x5 + bias + LN + relu chained.

normprobe.py showed the jnp whole-LN is near-bandwidth in ISOLATION
(0.83 ms on 134 MB) while the train-step trace shows 4.47 ms stats
fusions — the cost appears only next to the producer conv (layout
{3,0,2,1}: batch in sublanes). This probe reproduces the decoder
upsample-conv context and measures LN variants by marginal cost over a
conv-only baseline.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/normprobe2.py
"""

import os
import time

import numpy as np

K = int(os.environ.get("BENCH_K", "8"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
_EPS = 1e-5


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

    for (b, h, w, c) in [(16, 256, 256, 64), (16, 128, 128, 128)]:
        print(f"\n=== conv5x5 {c}->{c} @ {h}² batch {b} + LN ===", flush=True)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
        kern = jnp.asarray(rng.randn(5, 5, c, c) * 0.05, jnp.bfloat16)
        bias = jnp.asarray(rng.randn(c) * 0.01, jnp.float32)
        gamma = jnp.asarray(rng.rand(c), jnp.float32)
        beta = jnp.asarray(0.01 * rng.randn(c), jnp.float32)
        n = h * w * c

        def conv(t):
            tp = ops.pad2d(t, 2, "reflect")
            y = lax.conv_general_dilated(
                tp, kern, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return y + bias

        def chain_time(name, ln, k=K, reps=REPS):
            def step(t):
                y = conv(t)
                y = ln(y) if ln is not None else jnp.maximum(y, 0.0)
                return (y * 0.1).astype(jnp.bfloat16)
            def chained(t):
                for _ in range(k):
                    t = step(t)
                return t[0, 0, 0, 0].astype(jnp.float32)
            jfn = jax.jit(chained)
            float(jfn(x)); float(jfn(x))
            t0 = time.time()
            for _ in range(reps):
                s = jfn(x)
            float(s)
            dt = (time.time() - t0) / (reps * k)
            print(f"  {name:44s} {dt * 1e3:8.3f} ms/block", flush=True)
            return dt

        base = chain_time("conv+bias+relu (no LN baseline)", None)

        def ln0(y):
            yn = ops.whole_layer_norm(y, gamma, beta)
            return jnp.maximum(yn, 0.0)
        chain_time("v0 current whole_layer_norm", ln0)

        def ln1(y):
            s1 = jnp.sum(y, axis=(1, 2))
            s2 = jnp.sum(y * y, axis=(1, 2))
            s1 = jnp.sum(s1, axis=1)
            s2 = jnp.sum(s2, axis=1)
            mean = (s1 / n)[:, None, None, None]
            var = jnp.maximum(s2 / n - (s1 / n) ** 2, 0.0)
            std = jnp.sqrt(var * (n / (n - 1)))[:, None, None, None]
            yn = (y - mean) / (std + _EPS)
            return jnp.maximum(yn * gamma + beta, 0.0)
        chain_time("v1 per-channel-first stats", ln1)

        def ln2(y):
            ym = y.reshape(b, n)
            ones = jnp.ones((n, 1), jnp.float32)
            s1 = (ym @ ones)[:, 0]
            s2 = ((ym * ym) @ ones)[:, 0]
            mean = (s1 / n)[:, None, None, None]
            var = jnp.maximum(s2 / n - (s1 / n) ** 2, 0.0)
            std = jnp.sqrt(var * (n / (n - 1)))[:, None, None, None]
            yn = (y - mean) / (std + _EPS)
            return jnp.maximum(yn * gamma + beta, 0.0)
        chain_time("v2 matmul-with-ones stats", ln2)

        if has_pallas and 128 % c == 0 and (w * c) % 128 == 0:
            wl = w * c // 128
            th = h
            while th * wl * 128 * 4 > 2 * 1024 * 1024 and th % 2 == 0:
                th //= 2
            tl = h // th

            def _stats_kernel(x_ref, o_ref):
                xf = x_ref[0]
                o_ref[0, 0, 0] = jnp.sum(xf, axis=(0, 1))
                o_ref[0, 0, 1] = jnp.sum(xf * xf, axis=(0, 1))

            def ln3(y):
                yv = y.reshape(b, h, wl, 128)
                parts = pl.pallas_call(
                    _stats_kernel,
                    out_shape=jax.ShapeDtypeStruct((b, tl, 2, 128),
                                                   jnp.float32),
                    grid=(b, tl),
                    in_specs=[pl.BlockSpec((1, th, wl, 128),
                                           lambda i, j: (i, j, 0, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((1, 1, 2, 128),
                                           lambda i, j: (i, j, 0, 0),
                                           memory_space=pltpu.VMEM),
                )(yv)
                s1 = parts[:, :, 0].sum((1, 2))
                s2 = parts[:, :, 1].sum((1, 2))
                mean = (s1 / n)[:, None, None, None]
                var = jnp.maximum(s2 / n - (s1 / n) ** 2, 0.0)
                std = jnp.sqrt(var * (n / (n - 1)))[:, None, None, None]
                yn = (y - mean) / (std + _EPS)
                return jnp.maximum(yn * gamma + beta, 0.0)
            chain_time("v3 pallas lane-partial stats", ln3)


if __name__ == "__main__":
    main()
