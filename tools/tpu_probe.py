"""Quick TPU dispatch/compile latency probe (dev utility)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
x = jnp.asarray(np.random.randn(8, 256, 256, 64).astype(np.float32))
w = jnp.asarray(np.random.randn(3, 3, 64, 64).astype(np.float32) * 0.01)
f = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
    x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
t0 = time.time()
y = f(x, w)
y.block_until_ready()
print("compile+run1: %.2fs" % (time.time() - t0), flush=True)
t0 = time.time()
for _ in range(10):
    y = f(y, w)
y.block_until_ready()
print("10 steps: %.3fs" % (time.time() - t0), flush=True)
t0 = time.time()
z = np.asarray(y[:1, :4, :4, 0])
print("fetch: %.3fs" % (time.time() - t0), z.shape, flush=True)
