"""Int8 (W8A8) conv probe at the generator's inference shapes.

TPU v5e's MXU does s8 x s8 -> s32 at ~2x the bf16 rate (394 TOPS vs
~197 TF/s peak). If XLA lowers int8 `conv_general_dilated` natively, a
quantized inference path could push the serving numbers well past the
bf16 1.52 ms/image. This probe measures, per shape:

  v0  bf16 conv (+ relu)                      — production inference math
  v1  int8 conv -> s32, dequant+relu+requant  — the realistic W8A8 step
  v2  int8 conv -> s32 only                   — pure conv ceiling

K-unrolled single-dispatch chains with a scalar fetch (axon-tunnel
protocol, see convbench.py).

  python tools/int8probe.py
"""

from __future__ import annotations

import os
import time

import numpy as np

os.environ.setdefault("MUNIT_PALLAS", "0")
B = int(os.environ.get("BENCH_BATCH", "8"))
K = 8
OUTER = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    DIMS = ("NHWC", "HWIO", "NHWC")

    def measure(name, fn, xs, flops):
        @jax.jit
        def many(xs):
            return sum(jnp.sum(fn(xs[i]).astype(jnp.float32))
                       for i in range(K))
        try:
            float(many(xs))
        except Exception as e:  # noqa: BLE001 - report unsupported lowerings
            print(f"{name:38s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return None
        t0 = time.time()
        for _ in range(OUTER):
            out = many(xs)
        float(out)
        dt = (time.time() - t0) / (OUTER * K)
        tf = flops / dt / 1e12
        print(f"{name:38s} {dt*1e3:7.3f} ms  {tf:6.1f} TF/s", flush=True)
        return dt

    shapes = [
        ("res 3x3 256->256 @64", 64, 64, 256, 256, 3, 1),
        ("up 5x5 256->128 @128", 128, 128, 256, 128, 5, 1),
        ("up 5x5 128->64 @256", 256, 256, 128, 64, 5, 1),
        ("down 4x4 s2 64->128 @256", 256, 256, 64, 128, 4, 2),
    ]
    print(f"batch={B}, K={K} unrolled (v5e peaks: bf16 ~197 TF/s, "
          f"int8 ~394 TOP/s)")
    for name, h, w, cin, cout, k, s in shapes:
        kern_f = rng.randn(k, k, cin, cout).astype(np.float32) * 0.05
        # per-output-channel symmetric weight quant
        wmax = np.abs(kern_f).reshape(-1, cout).max(axis=0)
        sw = (wmax / 127.0).astype(np.float32)
        kern_i8 = jnp.asarray(
            np.clip(np.round(kern_f / sw), -127, 127).astype(np.int8))
        kern_bf = jnp.asarray(kern_f, jnp.bfloat16)
        sw_j = jnp.asarray(sw)

        xs_f = rng.randn(K, B, h, w, cin).astype(np.float32)
        xs_bf = jnp.asarray(xs_f, jnp.bfloat16)
        sx = np.float32(np.abs(xs_f).max() / 127.0)
        xs_i8 = jnp.asarray(
            np.clip(np.round(xs_f / sx), -127, 127).astype(np.int8))

        oh, ow = h // s, w // s
        flops = 2 * B * oh * ow * k * k * cin * cout

        def conv(x, kn, dt=None):
            return lax.conv_general_dilated(
                x, kn, window_strides=(s, s), padding="SAME",
                dimension_numbers=DIMS, preferred_element_type=dt)

        measure(f"{name} bf16", lambda x, kn=kern_bf:
                jax.nn.relu(conv(x, kn)), xs_bf, flops)

        scale = sx * sw_j  # (cout,) f32
        so = np.float32(1.0)  # pretend output scale

        def w8a8(x, kn=kern_i8, sc=scale):
            y = conv(x, kn, jnp.int32)
            y = jax.nn.relu(y.astype(jnp.float32) * sc)
            return jnp.clip(jnp.round(y / so), -127, 127).astype(jnp.int8)

        measure(f"{name} int8+requant", w8a8, xs_i8, flops)
        measure(f"{name} int8 raw s32", lambda x, kn=kern_i8:
                conv(x, kn, jnp.int32), xs_i8, flops)


if __name__ == "__main__":
    main()
