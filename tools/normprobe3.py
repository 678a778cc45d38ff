"""Layout-faithful whole-LN probe: decoder tail with s2d consumer + grad.

The real train-step graph lays the decoder LN inputs out as {3,0,2,1}
(batch-in-sublane; forced by the space-to-depth out-conv consumers), where
the per-sample stats fusion costs 4.47 ms vs ~1 ms in default layout
(normprobe2). This probe reproduces that context — conv5x5 -> LN+relu ->
s2d 7x7 out-conv -> 1x1 re-expand, chained, UNDER GRAD — and compares the
current jnp LN against a Pallas lane-partial stats kernel.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/normprobe3.py
"""

import os
import time

import numpy as np

K = int(os.environ.get("BENCH_K", "6"))
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)

    b, h, w, c = 16, 256, 256, 64
    n = h * w * c
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    kern5 = jnp.asarray(rng.randn(5, 5, c, c) * 0.05, jnp.bfloat16)
    bias5 = jnp.asarray(rng.randn(c) * 0.01, jnp.float32)
    kern7 = jnp.asarray(rng.randn(7, 7, c, 3) * 0.05, jnp.bfloat16)
    bias7 = jnp.asarray(rng.randn(3) * 0.01, jnp.float32)
    kern1 = jnp.asarray(rng.randn(1, 1, 3, c) * 0.3, jnp.bfloat16)
    gamma = jnp.asarray(rng.rand(c), jnp.float32)
    beta = jnp.asarray(0.01 * rng.randn(c), jnp.float32)

    def conv5(t):
        tp = ops.pad2d(t, 2, "reflect")
        y = ops.conv2d(tp, kern5, None, 1).astype(jnp.float32)
        return y + bias5

    def tail(z):
        out = ops.conv2d_s2d(z.astype(jnp.bfloat16), kern7, bias7, f=8)
        out = jnp.tanh(out)
        y = ops.conv2d(out, kern1, None, 1)
        return y.astype(jnp.bfloat16)

    # Pallas lane-partial per-sample stats on the (B,H,WC/128,128) view
    wl = w * c // 128
    th = h
    while th * wl * 128 * 4 > 2 * 1024 * 1024 and th % 2 == 0:
        th //= 2
    tl = h // th

    def _stats_kernel(x_ref, o_ref):
        xf = x_ref[0].astype(jnp.float32)
        o_ref[0, 0, 0] = jnp.sum(xf, axis=(0, 1))
        o_ref[0, 0, 1] = jnp.sum(xf * xf, axis=(0, 1))

    def pallas_moments(y):
        yv = y.reshape(b, h, wl, 128)
        parts = pl.pallas_call(
            _stats_kernel,
            out_shape=jax.ShapeDtypeStruct((b, tl, 2, 128), jnp.float32),
            grid=(b, tl),
            in_specs=[pl.BlockSpec((1, th, wl, 128),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(yv)
        s1 = parts[:, :, 0].sum((1, 2))
        s2 = parts[:, :, 1].sum((1, 2))
        return s1, s2

    def ln_from_sums(y, s1, s2):
        mean = (s1 / n)[:, None, None, None]
        var = jnp.maximum(s2 / n - (s1 / n) ** 2, 0.0)
        std = jnp.sqrt(var * (n / (n - 1)))[:, None, None, None]
        yn = (y - mean) / (std + _EPS)
        return jnp.maximum(yn * gamma + beta, 0.0)

    def ln_v0(y):
        return jnp.maximum(ops.whole_layer_norm(y, gamma, beta), 0.0)

    def ln_v1(y):
        s1, s2 = pallas_moments(y)
        return ln_from_sums(y, s1, s2)

    # v2: pallas stats with recompute-free custom VJP — bwd reductions
    # (sum g*gamma, sum g*gamma*yn) also via the pallas kernel pattern
    def _dot_kernel(a_ref, b_ref, o_ref):
        af = a_ref[0].astype(jnp.float32)
        bf = b_ref[0].astype(jnp.float32)
        o_ref[0, 0, 0] = jnp.sum(af, axis=(0, 1))
        o_ref[0, 0, 1] = jnp.sum(af * bf, axis=(0, 1))

    def pallas_sums_ab(a, bb):
        av = a.reshape(b, h, wl, 128)
        bv = bb.reshape(b, h, wl, 128)
        parts = pl.pallas_call(
            _dot_kernel,
            out_shape=jax.ShapeDtypeStruct((b, tl, 2, 128), jnp.float32),
            grid=(b, tl),
            in_specs=[pl.BlockSpec((1, th, wl, 128),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((1, 1, 2, 128), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(av, bv)
        return parts[:, :, 0].sum((1, 2)), parts[:, :, 1].sum((1, 2))

    import functools

    @jax.custom_vjp
    def ln_v2(y):
        s1, s2 = pallas_moments(y)
        return ln_from_sums(y, s1, s2)

    def _v2_fwd(y):
        s1, s2 = pallas_moments(y)
        out = ln_from_sums(y, s1, s2)
        return out, (y, s1, s2)

    def _v2_bwd(res, g):
        y, s1, s2 = res
        mean = (s1 / n)[:, None, None, None]
        var = jnp.maximum(s2 / n - (s1 / n) ** 2, 0.0)
        sd = jnp.sqrt(var * (n / (n - 1)))[:, None, None, None]
        d = sd + _EPS
        yn = (y - mean) / d
        relu_mask = (yn * gamma + beta) > 0
        gh = jnp.where(relu_mask, g, 0.0) * gamma           # ghat
        S1, S2 = pallas_sums_ab(gh, (y - mean))
        S1 = S1[:, None, None, None]
        S2 = S2[:, None, None, None]
        dx = gh / d - S1 / (n * d) - (y - mean) * (
            S2 / (d * d * (n - 1) * sd))
        return (dx.astype(y.dtype),)

    ln_v2.defvjp(_v2_fwd, _v2_bwd)

    # v3: identical closed-form bwd but all-jnp reductions — isolates the
    # pallas contribution from the closed-form-vs-autodiff contribution
    @jax.custom_vjp
    def ln_v3(y):
        xf = y.astype(jnp.float32)
        s1 = jnp.sum(xf)  # placeholder; real stats below
        return ln_from_sums(y, jnp.sum(xf, axis=(1, 2, 3)),
                            jnp.sum(xf * xf, axis=(1, 2, 3)))

    def _v3_fwd(y):
        xf = y.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=(1, 2, 3))
        s2 = jnp.sum(xf * xf, axis=(1, 2, 3))
        return ln_from_sums(y, s1, s2), (y, s1, s2)

    def _v3_bwd(res, g):
        y, s1, s2 = res
        mean = (s1 / n)[:, None, None, None]
        var = jnp.maximum(s2 / n - (s1 / n) ** 2, 0.0)
        sd = jnp.sqrt(var * (n / (n - 1)))[:, None, None, None]
        d = sd + _EPS
        yn = (y - mean) / d
        relu_mask = (yn * gamma + beta) > 0
        gh = jnp.where(relu_mask, g, 0.0) * gamma
        S1 = jnp.sum(gh, axis=(1, 2, 3))[:, None, None, None]
        S2 = jnp.sum(gh * (y - mean), axis=(1, 2, 3))[:, None, None, None]
        dx = gh / d - S1 / (n * d) - (y - mean) * (
            S2 / (d * d * (n - 1) * sd))
        return (dx.astype(y.dtype),)

    ln_v3.defvjp(_v3_fwd, _v3_bwd)

    def chain_time(name, ln, k=K, reps=REPS):
        def step(t):
            y = conv5(t)
            z = ln(y)
            return tail(z)
        def loss(t):
            for _ in range(k):
                t = step(t)
            return jnp.sum(t.astype(jnp.float32) ** 2)
        gfn = jax.jit(jax.grad(loss))
        r = gfn(x); float(r[0, 0, 0, 0]); r = gfn(x); float(r[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(reps):
            r = gfn(x)
        float(r[0, 0, 0, 0])
        dt = (time.time() - t0) / (reps * k)
        print(f"  {name:44s} {dt * 1e3:8.3f} ms/block (fwd+bwd)", flush=True)
        return dt

    print(f"=== decoder tail (conv5x5 {c} -> LN+relu -> s2d out7x7 -> 1x1) "
          f"@ {h}² batch {b}, grad ===", flush=True)
    chain_time("v0 current whole_layer_norm", ln_v0)
    # (no v1: pallas_call has no autodiff rule without a custom VJP)
    chain_time("v2 pallas stats fwd + pallas-sum bwd", ln_v2)
    chain_time("v3 jnp closed-form custom VJP", ln_v3)

    # numeric check of v2 against v0 under grad
    def loss_of(ln):
        def f(t):
            return jnp.sum(tail(ln(conv5(t))).astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(f))
    g0 = np.asarray(loss_of(ln_v0)(x), np.float32)
    g2 = np.asarray(loss_of(ln_v2)(x), np.float32)
    denom = np.abs(g0).max() + 1e-8
    print(f"v2 grad max rel err vs v0: {np.abs(g0 - g2).max() / denom:.2e}")


if __name__ == "__main__":
    main()
