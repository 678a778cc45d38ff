"""Why the in-context int8 path loses: materialized (reflect) pads vs
window padding, production-faithful res-conv chain.

  v0  bf16: pad2d(reflect) -> conv -> IN+relu   (production inference)
  v1  int8: quantize -> pad2d -> int8 conv -> dequant IN+relu (the e2e path)
  v2  int8: quantize -> int8 conv SAME (window zero pad, no materialized
      s8 pad) -> dequant IN+relu — borders wrong, timing-only control

If v2 wins where v1 loses, the cost is the odd-size s8 pad materialization
((4,1) int8 tiling misalignment), not the int8 convs themselves.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/int8probe2.py
"""

import os
import time

import numpy as np

B, K, OUTER, N = 8, 4, 8, 4  # N chained res-conv layers per application


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from munit_tpu.core import ops
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)

    rng = np.random.RandomState(0)
    h = w = 64
    c = 256
    kerns = [jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.float32)
             for _ in range(N)]
    xs = jnp.asarray(rng.randn(K, B, h, w, c), jnp.float32)
    DIMS = ("NHWC", "HWIO", "NHWC")

    def in_relu(y):
        return jax.nn.relu(ops.instance_norm(y))

    def v0(x):
        for kn in kerns:
            x = in_relu(ops.conv2d(ops.pad2d(x, 1, "reflect"), kn, None, 1))
        return x

    def _q(x):
        sx = jnp.float32(0.05)
        return jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8), sx

    kq = []
    for kn in kerns:
        sw = jnp.max(jnp.abs(kn), axis=(0, 1, 2)) / 127.0
        kq.append((jnp.clip(jnp.round(kn / sw), -127, 127).astype(jnp.int8),
                   sw))

    def v1(x):
        for kqi, sw in kq:
            xq, sx = _q(x)
            xq = ops.pad2d(xq, 1, "reflect")
            y = lax.conv_general_dilated(
                xq, kqi, (1, 1), "VALID", dimension_numbers=DIMS,
                preferred_element_type=jnp.int32)
            x = in_relu(y.astype(jnp.float32) * (sx * sw))
        return x

    def v2(x):
        for kqi, sw in kq:
            xq, sx = _q(x)
            y = lax.conv_general_dilated(
                xq, kqi, (1, 1), "SAME", dimension_numbers=DIMS,
                preferred_element_type=jnp.int32)
            x = in_relu(y.astype(jnp.float32) * (sx * sw))
        return x

    def measure(name, fn):
        @jax.jit
        def many(xs):
            return sum(jnp.sum(fn(xs[i]).astype(jnp.float32))
                       for i in range(K))
        float(many(xs))
        t0 = time.time()
        for _ in range(OUTER):
            out = many(xs)
        float(out)
        dt = (time.time() - t0) / (OUTER * K * N)
        print(f"{name:44s} {dt*1e3:7.3f} ms/layer", flush=True)

    measure("v0 bf16 reflect-pad conv IN+relu", v0)
    measure("v1 int8 materialized reflect pad", v1)
    measure("v2 int8 SAME window pad (timing control)", v2)


if __name__ == "__main__":
    main()
