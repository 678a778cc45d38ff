"""Winograd F(2x2,3x3) probe for the res-chain convs — the "conv algebra"
lever (ROADMAP): the 121.8-era HLO attribution puts the decoder+content
res-chain backward at ~32% of the fused step, all 3x3 s1 256->256 convs at
64² in the wide-16 batch. F(2x2,3x3) cuts MACs 2.25x and its transform
matrices (BT/AT all ±1, G halves) are exact dyadic arithmetic, so bf16
transforms add only reordering error. Because the forward is expressed in
plain slices/adds/dots, autodiff yields the Winograd BACKWARD for free:
d(dot) wrt U is the transform-domain dgrad (2.25x fewer MACs than native
dgrad) and wrt Gk the transform-domain wgrad (one [C,M]x[M,N] dot family).

Probes a production-faithful res-block chain (pad->conv->IN->relu ->
pad->conv->IN -> +residual, the reference networks.py:603-624 structure)
under grad, v0 native conv vs v1 winograd, K-unrolled single dispatch.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/winoprobe.py
"""

import os
import time

import numpy as np

K = int(os.environ.get("BENCH_K", "2"))        # chain repeats per dispatch
REPS = int(os.environ.get("BENCH_REPS", "5"))
B = int(os.environ.get("BENCH_BATCH", "16"))   # wide=1 gen forward batch
H = int(os.environ.get("BENCH_H", "64"))       # res-chain spatial at 256²
C = int(os.environ.get("BENCH_C", "256"))
R = 4                                          # res blocks per chain (as shipped)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.core import ops
    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, C), jnp.bfloat16)
    # R blocks x 2 convs each
    ks = [jnp.asarray(rng.randn(3, 3, C, C) * (0.05 if i % 2 else 0.03),
                      jnp.float32) for i in range(2 * R)]

    # --- winograd F(2x2,3x3) -------------------------------------------------
    Gm = np.array([[1, 0, 0], [.5, .5, .5], [.5, -.5, .5], [0, 0, 1]],
                  np.float32)

    def wino_conv3x3(xp, k, batched=False, prec=lax.Precision.DEFAULT):
        """VALID 3x3 conv over an already padded NHWC input via F(2x2,3x3).
        xp: [B, H+2, W+2, C] with H, W even. k: [3,3,C,N] f32."""
        b, hp, wp, c = xp.shape
        h, w = hp - 2, wp - 2
        nh, nw = h // 2, w // 2
        n = k.shape[-1]
        # s2d cells of the padded input; slab(u,v) = cells shifted by u//2,
        # phase u%2 — unit-stride slices only (no strided gathers).
        s = xp.reshape(b, hp // 2, 2, wp // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5)

        def slab(u, v):
            return s[:, u // 2:u // 2 + nh, v // 2:v // 2 + nw,
                     u % 2, v % 2, :]

        d = [[slab(u, v) for v in range(4)] for u in range(4)]

        def bt(a):      # BT = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
            return [a[0] - a[2], a[1] + a[2], a[2] - a[1], a[1] - a[3]]

        t = [bt([d[u][v] for u in range(4)]) for v in range(4)]  # t[v][u']
        u_ = [bt([t[v] [up] for v in range(4)]) for up in range(4)]  # u_[u'][v']

        gk = jnp.einsum("au,bv,uvcn->abcn", Gm, Gm, k).astype(xp.dtype)
        m = b * nh * nw
        if batched:
            uu = jnp.stack([u_[a][bb].reshape(m, c)
                            for a in range(4) for bb in range(4)])
            yy = lax.dot_general(uu, gk.reshape(16, c, n),
                                 (((2,), (1,)), ((0,), (0,))),
                                 precision=prec)
            y = [[yy[4 * a + bb].reshape(b, nh, nw, n) for bb in range(4)]
                 for a in range(4)]
        else:
            y = [[lax.dot_general(u_[a][bb].reshape(m, c), gk[a, bb],
                                  (((1,), (0,)), ((), ())),
                                  precision=prec)
                  .reshape(b, nh, nw, n)
                  for bb in range(4)] for a in range(4)]

        def at(a):      # AT = [[1,1,1,0],[0,1,-1,-1]]
            return [a[0] + a[1] + a[2], a[1] - a[2] - a[3]]

        rrow = [at([y[a][bb] for a in range(4)]) for bb in range(4)]  # [v'][r]
        o = [at([rrow[bb][r] for bb in range(4)]) for r in range(2)]  # o[r][s]
        z = jnp.stack([o[0][0], o[0][1], o[1][0], o[1][1]], axis=3)
        z = z.reshape(b, nh, nw, 2, 2, n).transpose(0, 1, 3, 2, 4, 5)
        return z.reshape(b, h, w, n)

    # --- exactness (f32) -----------------------------------------------------
    xf = jnp.asarray(rng.randn(2, 16, 16, 32), jnp.float32)
    kf = jnp.asarray(rng.randn(3, 3, 32, 32) * 0.1, jnp.float32)
    ops.set_conv_compute(None, lax.Precision.HIGHEST)
    ref = jax.jit(lambda a, b_: ops.conv2d(a, b_))(
        ops.pad2d(xf, 1, "reflect"), kf)
    got = jax.jit(lambda a, b_: wino_conv3x3(a, b_, prec=lax.Precision.HIGHEST))(
        ops.pad2d(xf, 1, "reflect"), kf)
    print(f"f32 parity max|d| = "
          f"{float(jnp.max(jnp.abs(ref - got))):.2e}", flush=True)
    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)

    # --- chains --------------------------------------------------------------
    def in_norm(y):
        yf = y.astype(jnp.float32)
        m1 = jnp.mean(yf, axis=(1, 2), keepdims=True)
        m2 = jnp.mean(yf * yf, axis=(1, 2), keepdims=True)
        v = jnp.maximum(m2 - m1 * m1, 0.0)
        return ((yf - m1) * lax.rsqrt(v + 1e-5)).astype(y.dtype)

    def make_chain(conv):
        def chain(t, kernels):
            for r in range(R):
                k1, k2 = kernels[2 * r], kernels[2 * r + 1]
                y = conv(ops.pad2d(t, 1, "reflect"), k1)
                y = jnp.maximum(in_norm(y), 0.0)
                y = conv(ops.pad2d(y, 1, "reflect"), k2)
                t = t + in_norm(y)
            return t
        return chain

    def conv_native(xp, k):
        return ops.conv2d(xp, k)

    def conv_wino(xp, k):
        return wino_conv3x3(xp, k)

    def conv_wino_b(xp, k):
        return wino_conv3x3(xp, k, batched=True)

    # bf16 chain parity
    ca = jax.jit(lambda t: make_chain(conv_native)(t, ks))(x)
    cb = jax.jit(lambda t: make_chain(conv_wino)(t, ks))(x)
    print(f"bf16 chain parity max|d| = "
          f"{float(jnp.max(jnp.abs(ca.astype(jnp.float32) - cb.astype(jnp.float32)))):.2e}",
          flush=True)

    def time_grad(name, conv):
        chain = make_chain(conv)

        def loss(t, kernels):
            for _ in range(K):
                t = chain(t, kernels)
            return jnp.sum(t.astype(jnp.float32) ** 2)

        gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))
        r = gfn(x, ks); float(r[0][0, 0, 0, 0])
        r = gfn(x, ks); float(r[0][0, 0, 0, 0])
        t0 = time.time()
        for _ in range(REPS):
            r = gfn(x, ks)
        float(r[0][0, 0, 0, 0])
        dt = (time.time() - t0) / (REPS * K) * 1e3
        print(f"{name:28s} {dt:8.2f} ms/chain(4 res blocks, fwd+bwd)",
              flush=True)
        return dt

    def time_fwd(name, conv):
        chain = make_chain(conv)

        def f(t, kernels):
            for _ in range(K):
                t = chain(t, kernels)
            return jnp.sum(t.astype(jnp.float32))

        fn = jax.jit(f)
        float(fn(x, ks)); float(fn(x, ks))
        t0 = time.time()
        for _ in range(REPS):
            r = fn(x, ks)
        float(r)
        dt = (time.time() - t0) / (REPS * K) * 1e3
        print(f"{name:28s} {dt:8.2f} ms/chain(4 res blocks, fwd only)",
              flush=True)
        return dt

    time_fwd("v0 native fwd", conv_native)
    time_fwd("v1 winograd fwd", conv_wino)
    time_fwd("v1b winograd-batched fwd", conv_wino_b)
    time_grad("v0 native", conv_native)
    time_grad("v1 winograd", conv_wino)
    time_grad("v1b winograd-batched", conv_wino_b)
    time_grad("v0 native re-measure", conv_native)


if __name__ == "__main__":
    main()
