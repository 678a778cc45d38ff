"""Cross-layer LN×s2d fusion probe (VERDICT r2 #7 — the untried lever).

Formulation v4: the decoder's whole-tensor LayerNorm is permutation-
invariant over (C,H,W), reflect padding commutes with per-sample
elementwise normalization, and the s2d far-side zero rows are never read
by a nonzero rearranged-kernel tap. Therefore the chain

    conv5x5 -> LN + relu -> pad -> s2d -> out-conv7x7

can be computed exactly as

    conv5x5 -> stats over an s2d VIEW of y -> pad -> s2d
            -> elementwise normalize(+tiled gamma/beta) + relu -> out-conv

which moves the per-sample stats reduce and the normalize out of the
{3,0,2,1}-pinned layout (the round-2 4.47 ms/fusion cost, BENCH.md) and
into the s2d-friendly layout the out-conv wants anyway.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/normprobe4.py
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
    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)

    b, h, w, c = 16, 256, 256, 64
    f = 8
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
        out = ops.conv2d_s2d(z.astype(jnp.bfloat16), kern7, bias7, f=f)
        out = jnp.tanh(out)
        y = ops.conv2d(out, kern1, None, 1)
        return y.astype(jnp.bfloat16)

    # --- v0: current production path -------------------------------------
    def block_v0(t):
        y = conv5(t)
        z = jnp.maximum(ops.whole_layer_norm(y, gamma, beta), 0.0)
        return tail(z)

    # --- v4: stats from s2d view, normalize+relu after pad+s2d -----------
    gamma_s2d = jnp.tile(gamma, f * f)
    beta_s2d = jnp.tile(beta, f * f)

    def ln_s2d_tail(y, barrier):
        # per-sample stats over an s2d rearrangement (same elements)
        zs = ops.space_to_depth(y, f)
        if barrier:
            zs = lax.optimization_barrier(zs)
        zf = zs.astype(jnp.float32)
        s1 = jnp.sum(zf, axis=(1, 2, 3))
        s2 = jnp.sum(zf * zf, axis=(1, 2, 3))
        mean = (s1 / n)[:, None, None, None]
        var = jnp.maximum(s2 / n - (s1 / n) ** 2, 0.0)
        std = jnp.sqrt(var * (n / (n - 1)))[:, None, None, None]
        # pad + s2d the raw conv output, then normalize in s2d space
        k = kern7.shape[0]
        p0 = (k - 1) // 2
        xp = ops.pad2d(y, p0, "reflect")
        e = (-(h + 2 * p0)) % f
        if e:
            xp = jnp.pad(xp, ((0, 0), (0, e), (0, e), (0, 0)))
        xs = ops.space_to_depth(xp, f)
        xn = (xs - mean) / (std + _EPS) * gamma_s2d + beta_s2d
        xn = jnp.maximum(xn, 0.0).astype(jnp.bfloat16)
        s = jnp.asarray(ops._s2d_select(f, k), kern7.dtype)
        k2 = jnp.einsum("apru,bqsv,uvcn->abpqcrsn", s, s, kern7)
        span = s.shape[0]
        k2 = k2.reshape(span, span, f * f * c, f * f * 3)
        y2 = ops.conv2d(xn, k2, None, 1)[:, :h // f, :w // f, :]
        out = ops.depth_to_space(y2, f) + bias7
        out = jnp.tanh(out)
        return ops.conv2d(out, kern1, None, 1).astype(jnp.bfloat16)

    def block_v4(t):
        return ln_s2d_tail(conv5(t), barrier=False)

    def block_v4b(t):
        return ln_s2d_tail(conv5(t), barrier=True)

    # --- v5: bf16 slab through pad+s2d (v0-equal traffic), f32 stats ------
    def ln_s2d_tail_bf16(y):
        yh = y.astype(jnp.bfloat16)
        zs = ops.space_to_depth(yh, f)
        zf = zs.astype(jnp.float32)
        s1 = jnp.sum(zf, axis=(1, 2, 3))
        s2 = jnp.sum(zf * zf, axis=(1, 2, 3))
        mean = (s1 / n)[:, None, None, None]
        var = jnp.maximum(s2 / n - (s1 / n) ** 2, 0.0)
        std = jnp.sqrt(var * (n / (n - 1)))[:, None, None, None]
        k = kern7.shape[0]
        p0 = (k - 1) // 2
        xp = ops.pad2d(yh, p0, "reflect")
        e = (-(h + 2 * p0)) % f
        if e:
            xp = jnp.pad(xp, ((0, 0), (0, e), (0, e), (0, 0)))
        xs = ops.space_to_depth(xp, f)
        xn = (xs.astype(jnp.float32) - mean) / (std + _EPS) \
            * gamma_s2d + beta_s2d
        xn = jnp.maximum(xn, 0.0).astype(jnp.bfloat16)
        s = jnp.asarray(ops._s2d_select(f, k), kern7.dtype)
        k2 = jnp.einsum("apru,bqsv,uvcn->abpqcrsn", s, s, kern7)
        span = s.shape[0]
        k2 = k2.reshape(span, span, f * f * c, f * f * 3)
        y2 = ops.conv2d(xn, k2, None, 1)[:, :h // f, :w // f, :]
        out = ops.depth_to_space(y2, f) + bias7
        out = jnp.tanh(out)
        return ops.conv2d(out, kern1, None, 1).astype(jnp.bfloat16)

    def block_v5(t):
        return ln_s2d_tail_bf16(conv5(t))

    # --- control: no LN at all (bounds the attributable win) --------------
    def block_nonorm(t):
        y = conv5(t)
        z = jnp.maximum(y * gamma + beta, 0.0)
        return tail(z)

    def chain_time(name, block, k=K, reps=REPS):
        def loss(t):
            for _ in range(k):
                t = block(t)
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
    chain_time("v0 current whole_layer_norm", block_v0)
    chain_time("v4 s2d-space LN (stats via s2d view)", block_v4)
    chain_time("v4b + optimization_barrier on stats view", block_v4b)
    chain_time("v5 bf16-slab s2d-space LN", block_v5)
    chain_time("control: scale/shift only (no stats)", block_nonorm)

    g0 = np.asarray(jax.jit(jax.grad(
        lambda t: jnp.sum(block_v0(t).astype(jnp.float32) ** 2)))(x),
        np.float32)
    g4 = np.asarray(jax.jit(jax.grad(
        lambda t: jnp.sum(block_v4(t).astype(jnp.float32) ** 2)))(x),
        np.float32)
    denom = np.abs(g0).max() + 1e-8
    print(f"v4 grad max rel err vs v0: {np.abs(g0 - g4).max() / denom:.2e}")


if __name__ == "__main__":
    main()
