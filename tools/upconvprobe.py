"""Phase-decomposed nearest-upsample+conv5x5 probe.

Identity: y = conv5x5(reflect_pad(nearest_up2(x))) can be computed as four
3x3 phase convs on the UN-upsampled x (kernel taps that hit duplicated
pixels collapse: per axis, phase r=0 groups taps {0,1},{2,3},{4}; r=1
groups {0},{1,2},{3,4}) + depth-to-space — ~2.8x fewer MACs. Exact in the
interior; the 2-pixel output border (where the reflect pad of the
UPSAMPLED grid differs from reflect-on-source) is recomputed exactly from
thin upsampled strips and concatenated in.

Probes fwd+bwd in decoder context vs the current upsample+conv.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/upconvprobe.py
"""

import os
import time

import numpy as np

K = int(os.environ.get("BENCH_K", "8"))
REPS = int(os.environ.get("BENCH_REPS", "5"))


def main():
    import jax
    import jax.numpy as jnp
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.core import ops
    ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)

    S0 = np.array([[1, 1, 0, 0, 0], [0, 0, 1, 1, 0], [0, 0, 0, 0, 1]],
                  np.float32)
    S1 = np.array([[1, 0, 0, 0, 0], [0, 1, 1, 0, 0], [0, 0, 0, 1, 1]],
                  np.float32)

    def up_conv_ref(x, kern, bias):
        u = ops.upsample_nearest(x)
        return ops.conv2d(ops.pad2d(u, 2, "reflect"), kern, bias, 1)

    def up_conv_phase(x, kern, bias):
        b, h, w, c = x.shape
        co = kern.shape[3]
        sel = [jnp.asarray(S0), jnp.asarray(S1)]
        kf = kern.astype(jnp.float32)
        xp = ops.pad2d(x, 1, "reflect")
        phases = []
        for r in range(2):
            for s in range(2):
                # collapse taps in f32/HIGHEST: the default TPU einsum runs
                # at bf16 matmul precision and rounds the tap sums (1.5e-2!)
                krs = jnp.einsum("at,bu,tuio->abio", sel[r], sel[s], kf,
                                 precision=jax.lax.Precision.HIGHEST
                                 ).astype(kern.dtype)
                phases.append(ops.conv2d(xp, krs, None, 1))
        # (B,H,W,4,Co) -> depth_to_space
        y4 = jnp.stack(phases, axis=3).reshape(b, h, w, 4 * co)
        y = ops.depth_to_space(y4, 2)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        # exact border strips from thin upsampled slabs (2 out rows/cols)
        def strip_h(xs, top):
            us = ops.upsample_nearest(xs)                 # (B,8,2W,C)
            usp = ops.pad2d(us, 2, "reflect")
            yy = ops.conv2d(usp, kern, bias, 1)           # (B,8,2W,Co)
            return yy[:, :2] if top else yy[:, -2:]
        def strip_w(xs, left):
            us = ops.upsample_nearest(xs)                 # (B,2H,8,C)
            usp = ops.pad2d(us, 2, "reflect")
            yy = ops.conv2d(usp, kern, bias, 1)
            return yy[:, :, :2] if left else yy[:, :, -2:]
        top = strip_h(x[:, :4], True)
        bot = strip_h(x[:, -4:], False)
        y = jnp.concatenate([top, y[:, 2:-2], bot], axis=1)
        left = strip_w(x[:, :, :4], True)
        right = strip_w(x[:, :, -4:], False)
        return jnp.concatenate([left, y[:, :, 2:-2], right], axis=2)

    # correctness at f32 HIGHEST on small data first
    ops.set_conv_compute(None, jax.lax.Precision.HIGHEST)
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(2, 16, 24, 8), jnp.float32)
    ks = jnp.asarray(rng.randn(5, 5, 8, 4) * 0.1, jnp.float32)
    bs = jnp.asarray(rng.randn(4) * 0.1, jnp.float32)
    ref = np.asarray(up_conv_ref(xs, ks, bs))
    got = np.asarray(up_conv_phase(xs, ks, bs))
    err = np.abs(ref - got).max()
    print(f"exactness (f32, 16x24): max abs err = {err:.2e}", flush=True)
    assert err < 1e-4, "phase decomposition mismatch"

    ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)

    for (b, h, w, cin, cout) in [(16, 64, 64, 256, 128),
                                 (16, 128, 128, 128, 64)]:
        print(f"\n=== up2+conv5x5 {cin}->{cout} @ {h}² batch {b} ===",
              flush=True)
        x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
        kern = jnp.asarray(rng.randn(5, 5, cin, cout) * 0.05, jnp.bfloat16)
        bias = jnp.asarray(rng.randn(cout) * 0.01, jnp.float32)
        kd = jnp.asarray(rng.randn(1, 1, cout, cin) * 0.1, jnp.bfloat16)

        def chain_time(name, fn, k=K, reps=REPS):
            def step(t):
                y = fn(t, kern, bias)
                # 1x1 back down + stride-2 pool to return to (h,w,cin)
                y = ops.conv2d(y, kd, None, 2)
                return y.astype(jnp.bfloat16)
            def loss(t):
                for _ in range(k):
                    t = step(t)
                return jnp.sum(t.astype(jnp.float32) ** 2)
            gfn = jax.jit(jax.grad(loss))
            r = gfn(x); float(r[0, 0, 0, 0]); r = gfn(x)
            float(r[0, 0, 0, 0])
            t0 = time.time()
            for _ in range(reps):
                r = gfn(x)
            float(r[0, 0, 0, 0])
            dt = (time.time() - t0) / (reps * k)
            print(f"  {name:36s} {dt * 1e3:8.3f} ms/block (fwd+bwd)",
                  flush=True)

        chain_time("current upsample+conv5x5", up_conv_ref)
        chain_time("phase-decomposed 4x3x3 + d2s", up_conv_phase)

        got = np.asarray(up_conv_phase(x, kern, bias), np.float32)
        ref = np.asarray(up_conv_ref(x, kern, bias), np.float32)
        scale = np.abs(ref).max()
        print(f"  (bf16 max rel err: {np.abs(ref - got).max() / scale:.2e})")


if __name__ == "__main__":
    main()
