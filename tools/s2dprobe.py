"""Space-to-depth rearrangement formulation probe.

The r3 trace attributes ~20 ms/fused step + ~4 ms/dis step to the s2d
rescue's data movement: the 6-D transpose in space_to_depth /
depth_to_space (core/ops.py:212-223) lowers to layout copies running at
~3x below HBM speed on the 64-channel side (copy.2089 family,
/tmp/fused_up.hlo, BENCH.md r3).

Alternative formulation measured here: only the h-phase needs real data
movement — the w-phase merge is a contiguous (free) reshape:

    s2d:  concat_p [ x[:, p::f].reshape(b, h/f, w/f, f*c) ]  over lanes
    d2s:  stack_p  [ y[..., p-th lane block].reshape(b, h/f, w, n) ] on
          a new h-phase axis, then a contiguous merge reshape

Each strided h-slice / lane-block keeps the inner (w, c) dims fully
contiguous (>=33 KB runs), so the lowering is DMA-shaped rather than a
sublane/lane shuffle. s2d and d2s are inverse permutations, so each is
the other's custom VJP — the backward pass gets the same formulation
(the current transpose VJP re-emits the slow transpose).

Chain: out-conv-style 7x7 64->3 s2d f=8, then stem-style 7x7 3->64
s2d f=4, K-unrolled under grad at the fused-step batch (wide 16, 256²).

  PYTHONPATH=/root/.axon_site:/root/repo python tools/s2dprobe.py
"""

import functools
import os
import time

import numpy as np

K = int(os.environ.get("BENCH_K", "6"))
REPS = int(os.environ.get("BENCH_REPS", "5"))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.core import ops
    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)

    # --- slice/concat formulation ---------------------------------------
    def _s2d_slice_fwd(x, f):
        b, h, w, c = x.shape
        parts = [x[:, p::f, :, :].reshape(b, h // f, w // f, f * c)
                 for p in range(f)]
        return jnp.concatenate(parts, axis=-1)

    def _d2s_slice_fwd(x, f):
        b, hf, wf, cf = x.shape
        n = cf // (f * f)
        g = f * n
        parts = [x[..., p * g:(p + 1) * g].reshape(b, hf, wf * f, n)
                 for p in range(f)]
        return jnp.stack(parts, axis=2).reshape(b, hf * f, wf * f, n)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def s2d_v1(x, f):
        return _s2d_slice_fwd(x, f)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def d2s_v1(x, f):
        return _d2s_slice_fwd(x, f)

    s2d_v1.defvjp(lambda x, f: (_s2d_slice_fwd(x, f), None),
                  lambda f, _, g: (_d2s_slice_fwd(g, f),))
    d2s_v1.defvjp(lambda x, f: (_d2s_slice_fwd(x, f), None),
                  lambda f, _, g: (_s2d_slice_fwd(g, f),))

    # exactness vs the production transpose form
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(2, 16, 16, 5), jnp.float32)
    assert np.array_equal(np.asarray(s2d_v1(xs, 4)),
                          np.asarray(ops.space_to_depth(xs, 4)))
    zs = ops.space_to_depth(xs, 4)
    assert np.array_equal(np.asarray(d2s_v1(zs, 4)),
                          np.asarray(ops.depth_to_space(zs, 4)))
    g0 = jax.grad(lambda t: jnp.sum(ops.space_to_depth(t, 4) ** 3))(xs)
    g1 = jax.grad(lambda t: jnp.sum(s2d_v1(t, 4) ** 3))(xs)
    assert np.array_equal(np.asarray(g0), np.asarray(g1))
    print("exactness: ok", flush=True)

    b, h, w, c = 16, 256, 256, 64
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    kern_out = jnp.asarray(rng.randn(7, 7, c, 3) * 0.05, jnp.bfloat16)
    bias_out = jnp.asarray(rng.randn(3) * 0.01, jnp.float32)
    kern_stem = jnp.asarray(rng.randn(7, 7, 3, c) * 0.2, jnp.bfloat16)
    bias_stem = jnp.asarray(rng.randn(c) * 0.01, jnp.float32)

    def conv_s2d(xin, kernel, bias, f, s2d, d2s):
        k = kernel.shape[0]
        cin, cout = kernel.shape[2], kernel.shape[3]
        hh, ww = xin.shape[1], xin.shape[2]
        p0 = (k - 1) // 2
        xp = ops.pad2d(xin, p0, "reflect")
        e = (-(hh + 2 * p0)) % f
        if e:
            xp = jnp.pad(xp, ((0, 0), (0, e), (0, e), (0, 0)))
        xsl = s2d(xp, f)
        s = jnp.asarray(ops._s2d_select(f, k), kernel.dtype)
        k2 = jnp.einsum("apru,bqsv,uvcn->abpqcrsn", s, s, kernel)
        span = s.shape[0]
        k2 = k2.reshape(span, span, f * f * cin, f * f * cout)
        y2 = ops.conv2d(xsl, k2, None, 1)[:, :hh // f, :ww // f, :]
        y = d2s(y2, f)
        return y + bias.astype(y.dtype)

    def block(t, s2d, d2s):
        y3 = conv_s2d(t, kern_out, bias_out, 8, s2d, d2s)
        y3 = jnp.tanh(y3)
        y = conv_s2d(y3, kern_stem, bias_stem, 4, s2d, d2s)
        return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

    def chain_time(name, s2d, d2s, k=K, reps=REPS):
        def loss(t):
            for _ in range(k):
                t = block(t, s2d, d2s)
            return jnp.sum(t.astype(jnp.float32) ** 2)
        gfn = jax.jit(jax.grad(loss))
        r = gfn(x); float(r[0, 0, 0, 0])
        r = gfn(x); float(r[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(reps):
            r = gfn(x)
        float(r[0, 0, 0, 0])
        dt = (time.time() - t0) / (reps * k) * 1e3
        print(f"{name:28s} {dt:7.2f} ms/block", flush=True)
        return dt

    # parity of the full block between formulations (on-device, bf16)
    ya = jax.jit(lambda t: block(t, ops.space_to_depth,
                                 ops.depth_to_space))(x)
    yb = jax.jit(lambda t: block(t, s2d_v1, d2s_v1))(x)
    d = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                              - yb.astype(jnp.float32))))
    print(f"block parity max|Δ| = {d:.2e}", flush=True)

    chain_time("v0 transpose (production)", ops.space_to_depth,
               ops.depth_to_space)
    chain_time("v1 slice/concat custom-vjp", s2d_v1, d2s_v1)
    chain_time("v1b slice/concat autodiff", _s2d_slice_fwd, _d2s_slice_fwd)
    chain_time("v0 transpose (re-measure)", ops.space_to_depth,
               ops.depth_to_space)


if __name__ == "__main__":
    main()
