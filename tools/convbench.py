"""Isolated conv/primitive benchmarks at the exact shapes of the 256² MUNIT
net. Times K=8 unrolled applications on DISTINCT staged inputs inside ONE
jit (single dispatch — per-call RPC floor over the axon tunnel would
otherwise dominate sub-ms ops), reporting per-application time and achieved
TFLOP/s. Also probes space-to-depth reformulations of the small-channel 7×7
convs (stem 3→64, decoder output 64→3), the worst MFU offenders.

  python tools/convbench.py
"""

from __future__ import annotations

import os
import time

import numpy as np

os.environ.setdefault("MUNIT_PALLAS", "0")
B = int(os.environ.get("BENCH_BATCH", "8"))
K = 8          # unrolled applications per dispatch
OUTER = 8      # dispatches timed


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.core import ops

    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)
    act = jnp.bfloat16
    rng = np.random.RandomState(0)

    def measure(name, fn, xs, flops, extra=""):
        """fn: single-input callable; xs: [K, ...] staged inputs."""
        @jax.jit
        def many(xs):
            return sum(jnp.sum(fn(xs[i]).astype(jnp.float32))
                       for i in range(K))
        float(many(xs))  # compile+warm
        t0 = time.time()
        for _ in range(OUTER):
            out = many(xs)
        float(out)
        dt = (time.time() - t0) / (OUTER * K)
        tf = flops / dt / 1e12
        print(f"{name:34s} {dt*1e3:7.3f} ms  {tf:6.1f} TF/s {extra}",
              flush=True)
        return dt

    def stage(shape):
        return jnp.asarray(rng.randn(K, *shape), act)

    shapes = [
        ("stem 7x7 3->64 @256", 256, 256, 3, 64, 7, 1, 3),
        ("down 4x4 s2 64->128 @256", 256, 256, 64, 128, 4, 2, 1),
        ("down 4x4 s2 128->256 @128", 128, 128, 128, 256, 4, 2, 1),
        ("res 3x3 256->256 @64", 64, 64, 256, 256, 3, 1, 1),
        ("up 5x5 256->128 @128", 128, 128, 256, 128, 5, 1, 2),
        ("up 5x5 128->64 @256", 256, 256, 128, 64, 5, 1, 2),
        ("out 7x7 64->3 @256", 256, 256, 64, 3, 7, 1, 3),
    ]
    print(f"batch={B}, bf16, K={K} unrolled per dispatch "
          f"(v5e bf16 peak ~197 TF/s)")
    for name, h, w, cin, cout, k, s, p in shapes:
        kern = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.float32)
        xs = stage((B, h, w, cin))
        oh, ow = h // s, w // s
        flops = 2 * B * oh * ow * k * k * cin * cout
        measure(name, lambda x, kn=kern, pp=p, ss=s:
                ops.conv2d(ops.pad2d(x, pp, "reflect"), kn, None, ss),
                xs, flops)

    # --- space-to-depth probes -------------------------------------------
    def s2d(x):   # [B,H,W,C] -> [B,H/2,W/2,4C]
        b, h, w, c = x.shape
        return x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

    # down 4x4 s2 64->128 as 2x2 s1 conv on s2d(pad(x)):
    # y[i,j] = sum_{u,v<4} x[2i+u-1, 2j+v-1] k[u,v]  (pad 1)
    # on s2d grid: phases p=(u-1)%2 etc. Exact rearrangement, no waste.
    cin, cout = 64, 128
    kern = jnp.asarray(rng.randn(4, 4, cin, cout) * 0.05, jnp.float32)
    xs = stage((B, 256, 256, cin))

    def down_s2d(x, kn=kern):
        xp = ops.pad2d(x, 1, "reflect")          # [B,258,258,64]
        xp = s2d(xp)                              # [B,129,129,256]
        # y[i,j] = Σ_{u,v<4} xpad[2i+u,2j+v]·k[u,v]; xpad[2i+u] lives in s2d
        # cell (i+u//2, phase u%2) → 2x2 s1 conv with
        # K2[a,b,(p,q,c),n] = K[2a+p, 2b+q, c, n]  (u=2a+p row-major ✓)
        k2 = kn.reshape(2, 2, 2, 2, cin, cout)    # [a,p,b,q,c,n]
        k2 = k2.transpose(0, 2, 1, 3, 4, 5)       # [a,b,p,q,c,n]
        k2 = k2.reshape(2, 2, 4 * cin, cout)
        return ops.conv2d(xp, k2, None, 1)        # [B,128,128,cout]

    flops = 2 * B * 128 * 128 * 16 * cin * cout
    measure("down 4x4 s2 as s2d 2x2 s1", down_s2d, xs, flops)

    # --- dis stem: 4x4 s2 3->64 (lane-starved, no rescue today) ----------
    # The discriminator's first layer at each of the 3 scales (reference
    # networks.py:44: Conv2dBlock(3, dim, 4, 2, 1)). cin=3 wastes >95% of
    # the MXU's K dim; the f=2 strided s2d rearrangement (4x4 s2 == 2x2 s1
    # on the f=2 s2d grid, zero kernel waste) lifts cin to 12.
    for hh in (256, 128, 64):
        cin, cout = 3, 64
        kern = jnp.asarray(rng.randn(4, 4, cin, cout) * 0.05, jnp.float32)
        xs = stage((B, hh, hh, cin))
        oh = hh // 2
        flops = 2 * B * oh * oh * 16 * cin * cout

        def stem_direct(x, kn=kern):
            return ops.conv2d(ops.pad2d(x, 1, "reflect"), kn, None, 2)

        def stem_s2d(x, kn=kern, c=cin, n=cout):
            xp = ops.pad2d(x, 1, "reflect")
            xp = s2d(xp)
            k2 = kn.reshape(2, 2, 2, 2, c, n).transpose(0, 2, 1, 3, 4, 5)
            k2 = k2.reshape(2, 2, 4 * c, n)
            return ops.conv2d(xp, k2, None, 1)

        measure(f"dis stem 4x4 s2 3->64 @{hh}", stem_direct, xs, flops)
        measure(f"dis stem s2d 2x2 s1 @{hh}", stem_s2d, xs, flops)
        if hh == 256:
            # parity + the grad-path cost (bwd-kernel is also lane-starved)
            ya = jax.jit(stem_direct)(xs[0])
            yb = jax.jit(stem_s2d)(xs[0])
            d = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                      - yb.astype(jnp.float32))))
            print(f"   parity max|Δ| = {d:.2e}")
            for nm, fn in (("direct", stem_direct), ("s2d", stem_s2d)):
                gf = jax.jit(jax.grad(
                    lambda kn, x=xs[0], f=fn:
                    jnp.sum(f(x, kn).astype(jnp.float32) ** 2)))
                gf(kern); float(jnp.sum(gf(kern)))
                t0 = time.time()
                for _ in range(OUTER):
                    g = gf(kern)
                float(jnp.sum(g))
                print(f"   grad-wrt-kernel {nm:7s} "
                      f"{(time.time()-t0)/OUTER*1e3:7.3f} ms")

    # out 7x7 64->3: produce 2x2-s2d output (12 ch) from s2d input (256 ch)
    cin, cout = 64, 3
    kern = jnp.asarray(rng.randn(7, 7, cin, cout) * 0.05, jnp.float32)
    xs = stage((B, 256, 256, cin))

    def out_s2d(x, kn=kern):
        xp = ops.pad2d(x, 3, "reflect")           # [B,262,262,64]
        xp = s2d(xp)                               # [B,131,131,256]
        # y[2I+r, 2J+s] = sum_{u,v} xp_orig[2I+r+u, 2J+s+v] k[u,v]
        # xp_orig index 2I+r+u = 2(I+A)+p with A=(r+u)//2 in 0..3, p=(r+u)%2
        k2 = np.zeros((4, 4, 4, cin, 4, cout), np.float32)  # [A,Bb,(p,q),c,(r,s),n]
        kn_np = np.asarray(kn)
        for r_ in range(2):
            for s_ in range(2):
                for u in range(7):
                    for v in range(7):
                        A, p_ = divmod(r_ + u, 2)
                        Bb, q_ = divmod(s_ + v, 2)
                        k2[A, Bb, 2 * p_ + q_, :, 2 * r_ + s_, :] = kn_np[u, v]
        k2 = jnp.asarray(k2.reshape(4, 4, 4 * cin, 4 * cout))
        y2 = ops.conv2d(xp, k2, None, 1)          # [B,128,128,12]
        b = y2.shape[0]
        return y2.reshape(b, 128, 128, 2, 2, cout).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, 256, 256, cout)

    flops = 2 * B * 256 * 256 * 49 * cin * cout
    measure("out 7x7 64->3 as s2d 5x5", out_s2d, xs, flops,
            extra="(flops=logical; 4.1x padded)")

    # res 3x3 alternatives: shift-and-matmul (9 dots on strided slices) and
    # im2col (one [M, 9C] x [9C, N] dot) — probing whether XLA's native conv
    # at 55 TF/s leaves MXU headroom on the FLOP-dominant res-block shape.
    cin = cout = 256
    kern = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
    xs = stage((B, 64, 64, cin))
    flops = 2 * B * 64 * 64 * 9 * cin * cout

    def res_shift_matmul(x, kn=kern):
        xp = ops.pad2d(x, 1, "reflect")
        knb = kn.astype(x.dtype)
        acc = None
        for u in range(3):
            for v in range(3):
                sl = xp[:, u:u + 64, v:v + 64, :]
                y = jax.lax.dot_general(
                    sl, knb[u, v], (((3,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT)
                acc = y if acc is None else acc + y
        return acc

    measure("res 3x3 as 9 shifted matmuls", res_shift_matmul, xs, flops)

    def res_im2col(x, kn=kern):
        xp = ops.pad2d(x, 1, "reflect")
        cols = jnp.concatenate(
            [xp[:, u:u + 64, v:v + 64, :] for u in range(3)
             for v in range(3)], axis=-1)
        k2 = kn.astype(x.dtype).reshape(9 * cin, cout)
        return jax.lax.dot_general(
            cols, k2, (((3,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT)

    measure("res 3x3 as im2col matmul", res_im2col, xs, flops)

    # the same conv at batch 32 (MXU efficiency vs batch)
    xs32 = stage((32, 64, 64, cin))
    measure("res 3x3 256->256 @64 b32",
            lambda x, kn=kern: ops.conv2d(ops.pad2d(x, 1, "reflect"), kn,
                                          None, 1),
            xs32, flops * 4)

    # norms: single-pass vs two-pass instance norm at the res-block slab
    xs = stage((B, 64, 64, 256))

    def in_two_pass(x):
        return ops.instance_norm(x)

    def in_one_pass(x):
        xf = x.astype(jnp.float32)
        m1 = jnp.mean(xf, axis=(1, 2), keepdims=True)
        m2 = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
        var = m2 - m1 * m1
        return ((xf - m1) * lax.rsqrt(var + 1e-5)).astype(x.dtype)

    nbytes = B * 64 * 64 * 256 * 2 * 2
    t = measure("IN two-pass @64x64x256", in_two_pass, xs, 1)
    print(f"   -> {nbytes / t / 1e9:6.0f} GB/s effective")
    t = measure("IN one-pass @64x64x256", in_one_pass, xs, 1)
    print(f"   -> {nbytes / t / 1e9:6.0f} GB/s effective")


if __name__ == "__main__":
    main()
