"""Tiled two-pass Pallas norms (interpret mode): forward + grads vs ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from munit_tpu.core import ops
from munit_tpu.kernels.tiled import (
    adain_tiled, instance_norm_tiled, tiled_applicable, _tile_rows,
)

B, H, W, C = 2, 32, 16, 128  # multiple tiles (tile budget forces TH < H)


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    gamma = jnp.asarray(rng.randn(B, C).astype(np.float32))
    beta = jnp.asarray(rng.randn(B, C).astype(np.float32))
    return x, gamma, beta


def test_tile_rows_divides():
    assert H % _tile_rows(H, W, C) == 0
    assert _tile_rows(256, 256, 64) < 256  # big slab gets tiled


def test_applicable():
    assert tiled_applicable(jnp.zeros((1, 64, 64, 256)))
    assert not tiled_applicable(jnp.zeros((1, 60, 64, 256)))  # non-pow2 H


def test_instance_norm_tiled(data):
    x, _, _ = data
    np.testing.assert_allclose(np.asarray(instance_norm_tiled(x, False)),
                               np.asarray(ops.instance_norm(x)),
                               rtol=1e-4, atol=1e-5)
    want = jnp.maximum(ops.instance_norm(x), 0)
    np.testing.assert_allclose(np.asarray(instance_norm_tiled(x, True)),
                               np.asarray(want), rtol=1e-4, atol=1e-5)


def test_adain_tiled(data):
    x, gamma, beta = data
    np.testing.assert_allclose(np.asarray(adain_tiled(x, gamma, beta, True)),
                               np.asarray(jnp.maximum(
                                   ops.adain(x, gamma, beta), 0)),
                               rtol=1e-3, atol=1e-4)


def test_tiled_grads(data):
    x, gamma, beta = data
    g1 = jax.grad(lambda x, g, b: jnp.sum(
        jnp.sin(adain_tiled(x, g, b, True))), argnums=(0, 1, 2))(
        x, gamma, beta)
    g2 = jax.grad(lambda x, g, b: jnp.sum(
        jnp.sin(jnp.maximum(ops.adain(x, g, b), 0))), argnums=(0, 1, 2))(
        x, gamma, beta)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)
