"""Probe 2: steady-state fetch cost + compile scaling (dev utility)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

x = jnp.asarray(np.random.randn(4, 128, 128, 64).astype(np.float32))
w = jnp.asarray(np.random.randn(3, 3, 64, 64).astype(np.float32) * 0.01)


def block(n, reps):
    def f(x, w):
        for _ in range(n):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.mean(x)
    g = jax.jit(f)
    t0 = time.time()
    v = g(x, w)
    _ = float(v)
    print(f"chain{n}: compile+run+fetch {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        v = g(x, w)
    _ = float(v)
    print(f"chain{n}: {reps} runs + 1 fetch {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    _ = float(v)
    print(f"chain{n}: refetch same {time.time()-t0:.3f}s", flush=True)


block(1, 20)
block(50, 5)
