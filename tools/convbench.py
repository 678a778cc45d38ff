"""Isolated conv/primitive benchmarks at the exact shapes of the 256² MUNIT
net — measures achieved TFLOP/s per conv layer class (fwd and fwd+bwd), and
the cost of the pad→conv→norm→relu composition vs the bare conv.

  python tools/convbench.py
"""

from __future__ import annotations

import os
import time

import numpy as np

os.environ.setdefault("MUNIT_PALLAS", "0")
B = int(os.environ.get("BENCH_BATCH", "8"))


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

    # (name, H, W, Cin, Cout, k, stride, pad)
    shapes = [
        ("stem 7x7 3->64 @256", 256, 256, 3, 64, 7, 1, 3),
        ("down 4x4 s2 64->128 @256", 256, 256, 64, 128, 4, 2, 1),
        ("down 4x4 s2 128->256 @128", 128, 128, 128, 256, 4, 2, 1),
        ("res 3x3 256->256 @64", 64, 64, 256, 256, 3, 1, 1),
        ("up 5x5 256->128 @128", 128, 128, 256, 128, 5, 1, 2),
        ("up 5x5 128->64 @256", 256, 256, 128, 64, 5, 1, 2),
        ("out 7x7 64->3 @256", 256, 256, 64, 3, 7, 1, 3),
    ]

    def timeit(fn, *args, iters=30):
        out = fn(*args)
        jax.block_until_ready(out)
        # scalar-fetch sync (tunnel-safe)
        float(jnp.sum(out.astype(jnp.float32))[None][0])
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32))[None][0])
        return (time.time() - t0) / iters

    rng = np.random.RandomState(0)
    print(f"batch={B}, bf16 convs; TFLOP/s = achieved (v5e bf16 peak ~197)")
    for name, h, w, cin, cout, k, s, p in shapes:
        x = jnp.asarray(rng.randn(B, h, w, cin), act)
        kern = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.float32)
        bias = jnp.zeros((cout,), jnp.float32)
        oh, ow = h // s, w // s
        flops = 2 * B * oh * ow * k * k * cin * cout

        bare = jax.jit(lambda x, kn: ops.conv2d(ops.pad2d(x, p, "reflect"),
                                                kn, None, s))
        full = jax.jit(lambda x, kn, b: jnp.maximum(ops.instance_norm(
            ops.conv2d(ops.pad2d(x, p, "reflect"), kn, b, s)), 0))

        def bwd_loss(x, kn, b):
            y = jnp.maximum(ops.instance_norm(
                ops.conv2d(ops.pad2d(x, p, "reflect"), kn, b, s)), 0)
            return jnp.sum(y.astype(jnp.float32))
        gradfn = jax.jit(jax.grad(bwd_loss, argnums=(0, 1)))

        t_bare = timeit(bare, x, kern)
        t_full = timeit(full, x, kern, bias)
        t_bwd = timeit(lambda *a: gradfn(*a)[1], x, kern, bias)
        print(f"{name:28s} bare {t_bare*1e3:7.3f} ms ({flops/t_bare/1e12:5.1f} TF/s) | "
              f"+IN+relu {t_full*1e3:7.3f} ms ({flops/t_full/1e12:5.1f}) | "
              f"fwd+bwd {t_bwd*1e3:7.3f} ms ({3*flops/t_bwd/1e12:5.1f})",
              flush=True)

    # norm-only costs at the two big decoder LN sites
    for name, h, w, c in [("whole-LN @128x128x128", 128, 128, 128),
                          ("whole-LN @256x256x64", 256, 256, 64),
                          ("IN @64x64x256", 64, 64, 256)]:
        x = jnp.asarray(rng.randn(B, h, w, c), act)
        g = jnp.ones((c,), jnp.float32)
        bt = jnp.zeros((c,), jnp.float32)
        if name.startswith("whole"):
            f = jax.jit(lambda x: ops.whole_layer_norm(x, g, bt))
        else:
            f = jax.jit(lambda x: ops.instance_norm(x))
        t = timeit(f, x)
        gb = B * h * w * c * x.dtype.itemsize * 2 / 1e9
        print(f"{name:28s} {t*1e3:7.3f} ms ({gb/t:6.0f} GB/s eff rw)")


if __name__ == "__main__":
    main()
