"""Pallas kernel correctness (interpret mode on CPU): forward + grads vs the
jnp reference ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from munit_tpu.core import ops
from munit_tpu.kernels import (
    adain_fused, instance_norm_fused, whole_layer_norm_fused,
)

B, H, W, C = 2, 8, 16, 128  # lane-aligned slab


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    gamma = jnp.asarray(rng.randn(B, C).astype(np.float32))
    beta = jnp.asarray(rng.randn(B, C).astype(np.float32))
    return x, gamma, beta


def test_instance_norm_fused_fwd(data):
    x, _, _ = data
    np.testing.assert_allclose(np.asarray(instance_norm_fused(x, False)),
                               np.asarray(ops.instance_norm(x)),
                               rtol=1e-5, atol=1e-5)
    want = jnp.maximum(ops.instance_norm(x), 0)
    np.testing.assert_allclose(np.asarray(instance_norm_fused(x, True)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_adain_fused_fwd(data):
    x, gamma, beta = data
    np.testing.assert_allclose(np.asarray(adain_fused(x, gamma, beta, False)),
                               np.asarray(ops.adain(x, gamma, beta)),
                               rtol=1e-4, atol=1e-5)
    want = jnp.maximum(ops.adain(x, gamma, beta), 0)
    np.testing.assert_allclose(np.asarray(adain_fused(x, gamma, beta, True)),
                               np.asarray(want), rtol=1e-4, atol=1e-5)


def test_whole_layer_norm_fused_fwd(data):
    x, _, _ = data
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.rand(C).astype(np.float32))
    b = jnp.asarray(rng.randn(C).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(whole_layer_norm_fused(x, g, b, False)),
        np.asarray(ops.whole_layer_norm(x, g, b)), rtol=1e-4, atol=1e-5)


def test_ref_paths_bf16():
    # jnp fallbacks with custom VJPs keep bf16 output dtype and finite grads
    from munit_tpu.kernels.norms import instance_norm_ref, adain_ref
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 16, 128), jnp.bfloat16)
    g = jnp.asarray(rng.randn(2, 128), jnp.float32)
    b = jnp.asarray(rng.randn(2, 128), jnp.float32)
    y = instance_norm_ref(x, True)
    assert y.dtype == jnp.bfloat16
    dx = jax.grad(lambda x: jnp.sum(
        instance_norm_ref(x, True).astype(jnp.float32)))(x)
    assert np.isfinite(np.asarray(dx, dtype=np.float32)).all()
    y2 = adain_ref(x, g, b, False)
    assert y2.dtype == jnp.bfloat16


@pytest.mark.parametrize("relu", [False, True])
def test_adain_fused_grads(data, relu):
    x, gamma, beta = data

    def f_fused(x, g, b):
        return jnp.sum(jnp.sin(adain_fused(x, g, b, relu)))

    def f_ref(x, g, b):
        y = ops.adain(x, g, b)
        if relu:
            y = jnp.maximum(y, 0)
        return jnp.sum(jnp.sin(y))

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


def test_instance_norm_fused_grads(data):
    x, _, _ = data
    g1 = jax.grad(lambda x: jnp.sum(jnp.cos(instance_norm_fused(x, True))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.cos(
        jnp.maximum(ops.instance_norm(x), 0))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_whole_layer_norm_fused_grads(data):
    x, _, _ = data
    rng = np.random.RandomState(2)
    g = jnp.asarray(rng.rand(C).astype(np.float32))
    b = jnp.asarray(rng.randn(C).astype(np.float32))
    g1 = jax.grad(lambda x, g, b: jnp.sum(
        jnp.tanh(whole_layer_norm_fused(x, g, b, False))),
        argnums=(0, 1, 2))(x, g, b)
    g2 = jax.grad(lambda x, g, b: jnp.sum(
        jnp.tanh(ops.whole_layer_norm(x, g, b))), argnums=(0, 1, 2))(x, g, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)
