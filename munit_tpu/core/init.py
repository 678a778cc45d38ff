"""Weight initializers matching the reference's ``weights_init`` (utils.py:1066-1089).

The reference applies, per module class name:
- generators/aux nets: ``kaiming_normal_(a=0, mode='fan_in')`` on conv/linear
  weights, zero bias (``init: kaiming`` in config_256.yaml:17);
- discriminators: ``normal_(0, 0.02)`` ("gaussian"), zero bias;
- the custom LayerNorm gamma: ``uniform_()`` → U[0,1) (networks.py:859).

Flax initializer signature: ``f(key, shape, dtype)``. Conv kernels are HWIO, so
fan_in = H*W*I; Linear kernels are (in, out), fan_in = in — both match torch's
``_calculate_fan_in`` on OIHW / (out,in) weights.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _fan_in(shape) -> int:
    if len(shape) == 4:  # HWIO conv kernel
        return shape[0] * shape[1] * shape[2]
    if len(shape) == 2:  # (in, out) dense kernel
        return shape[0]
    raise ValueError(f"Unsupported kernel shape {shape}")


def kaiming_normal(key, shape, dtype=jnp.float32):
    """kaiming_normal_(a=0, mode='fan_in'): N(0, sqrt(2/fan_in))."""
    std = np.sqrt(2.0 / _fan_in(shape))
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


def gaussian(key, shape, dtype=jnp.float32):
    """normal_(0.0, 0.02) — discriminator init ("gaussian")."""
    return jax.random.normal(key, shape, dtype) * jnp.asarray(0.02, dtype)


def xavier_normal(key, shape, dtype=jnp.float32):
    """xavier_normal_(gain=sqrt(2))."""
    fan_out = shape[-1] * (shape[0] * shape[1] if len(shape) == 4 else 1)
    std = np.sqrt(2.0) * np.sqrt(2.0 / (_fan_in(shape) + fan_out))
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


def orthogonal(key, shape, dtype=jnp.float32):
    """orthogonal_(gain=sqrt(2)) on the (out, fan_in)-flattened weight."""
    return jax.nn.initializers.orthogonal(scale=np.sqrt(2.0))(key, shape, dtype)


def uniform01(key, shape, dtype=jnp.float32):
    """U[0,1) — custom-LayerNorm gamma init (networks.py:859)."""
    return jax.random.uniform(key, shape, dtype)


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def by_name(name: str):
    """Map config ``init:`` values (config_256.yaml:17) to initializers."""
    table = {
        "kaiming": kaiming_normal,
        "gaussian": gaussian,
        "xavier": xavier_normal,
        "orthogonal": orthogonal,
        "default": kaiming_normal,
    }
    if name not in table:
        raise ValueError(f"Unsupported initialization: {name}")
    return table[name]
