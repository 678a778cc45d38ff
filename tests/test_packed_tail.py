"""Exact-parity tests for the lane-packed decoder tail (core/packed_tail.py).

The packed tail must be EXACT (up to f32 association) against the production
chain — upsample -> pad-2 5x5 conv -> whole-LN -> act -> pad-3 7x7 conv —
including the border rings it recomputes with strip convs, and including
gradients w.r.t. every weight (the strip-overwrite backward is a scatter-add
that must route edge cotangents to the same parameters)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from munit_tpu.core import ops
from munit_tpu.core.packed_tail import (packed_decoder_tail, supported)


def _production_tail(x, k5, b5, gamma, beta, k7, b7, activ="relu"):
    act = ops.activation(activ)
    u = ops.upsample_nearest(x, 2)
    y = ops.conv2d(ops.pad2d(u, 2, "reflect"), k5, b5, 1)
    z = act(ops.whole_layer_norm(y, gamma, beta))
    return ops.conv2d(ops.pad2d(z, 3, "reflect"), k7, b7, 1)


def _make(rng, b, hs, ws, cin=32, cmid=16, cout=3):
    x = jnp.asarray(rng.randn(b, hs, ws, cin), jnp.float32)
    k5 = jnp.asarray(rng.randn(5, 5, cin, cmid) * 0.1, jnp.float32)
    b5 = jnp.asarray(rng.randn(cmid) * 0.05, jnp.float32)
    gamma = jnp.asarray(rng.rand(cmid) + 0.2, jnp.float32)
    beta = jnp.asarray(0.1 * rng.randn(cmid), jnp.float32)
    k7 = jnp.asarray(rng.randn(7, 7, cmid, cout) * 0.1, jnp.float32)
    b7 = jnp.asarray(rng.randn(cout) * 0.05, jnp.float32)
    return x, k5, b5, gamma, beta, k7, b7


@pytest.mark.parametrize("hs,ws", [(8, 8), (16, 16), (8, 12), (20, 8)])
def test_forward_exact(hs, ws):
    rng = np.random.RandomState(0)
    args = _make(rng, 2, hs, ws)
    assert supported(hs, ws)
    ref = _production_tail(*args)
    got = packed_decoder_tail(*args)
    assert got.shape == ref.shape == (2, 2 * hs, 2 * ws, 3)
    d = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert d <= 2e-5 * max(scale, 1.0), f"max|d|={d} scale={scale}"


@pytest.mark.parametrize("activ", ["relu", "lrelu", "none"])
def test_forward_exact_activations(activ):
    rng = np.random.RandomState(1)
    args = _make(rng, 1, 12, 12)
    ref = _production_tail(*args, activ=activ)
    got = packed_decoder_tail(*args, activ=activ)
    d = float(jnp.max(jnp.abs(got - ref)))
    assert d <= 2e-5 * max(float(jnp.max(jnp.abs(ref))), 1.0)


def test_grad_exact_all_params():
    rng = np.random.RandomState(2)
    x, k5, b5, gamma, beta, k7, b7 = _make(rng, 2, 12, 8)
    cot = jnp.asarray(rng.randn(2, 24, 16, 3), jnp.float32)

    def loss(fn, params):
        out = fn(x, *params)
        return jnp.sum(out * cot)

    params = (k5, b5, gamma, beta, k7, b7)
    g_ref = jax.grad(lambda p: loss(_production_tail, p))(params)
    g_got = jax.grad(lambda p: loss(packed_decoder_tail, p))(params)
    names = ["k5", "b5", "gamma", "beta", "k7", "b7"]
    for n, a, b_ in zip(names, g_ref, g_got):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        d = float(jnp.max(jnp.abs(a - b_)))
        assert d <= 5e-5 * scale, f"grad[{n}]: max|d|={d} scale={scale}"


def test_grad_exact_input():
    rng = np.random.RandomState(3)
    args = _make(rng, 1, 8, 8)
    x, rest = args[0], args[1:]

    def s(fn, t):
        return jnp.sum(jnp.tanh(fn(t, *rest)))

    g_ref = jax.grad(lambda t: s(_production_tail, t))(x)
    g_got = jax.grad(lambda t: s(packed_decoder_tail, t))(x)
    d = float(jnp.max(jnp.abs(g_ref - g_got)))
    scale = max(float(jnp.max(jnp.abs(g_ref))), 1.0)
    assert d <= 5e-5 * scale, f"input grad max|d|={d}"


def test_supported_guard():
    assert not supported(6, 8)      # h % 4 != 0... (6 % 4 == 2)
    assert not supported(8, 10)     # w % 4
    assert not supported(4, 4)      # too small for non-overlapping strips
    assert supported(128, 128)
    assert not supported(8, 8, k_up=3)
    assert not supported(8, 8, k_out=5)


def test_decoder_integration_parity(monkeypatch):
    """Decoder with MUNIT_PACKED_TAIL=1 matches =0 on the same params, and
    the param tree is identical (checkpoints interchange)."""
    from munit_tpu.nn.generator import Decoder

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32)
    dec = Decoder(n_upsample=2, n_res=1, dim=64, output_dim=3,
                  res_norm="in")

    monkeypatch.setenv("MUNIT_PACKED_TAIL", "0")
    params = dec.init(jax.random.PRNGKey(0), x)
    ref = dec.apply(params, x)

    monkeypatch.setenv("MUNIT_PACKED_TAIL", "1")
    params_p = dec.init(jax.random.PRNGKey(0), x)
    ptree = jax.tree_util.tree_structure(params_p)
    assert ptree == jax.tree_util.tree_structure(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(params),
                     jax.tree_util.tree_leaves(params_p)):
        assert a.shape == b_.shape
    got = dec.apply(params, x)

    d = float(jnp.max(jnp.abs(got - ref)))
    assert d <= 5e-5, f"decoder packed-vs-production max|d|={d}"
    assert got.shape == (2, 32, 32, 3)


def test_decoder_auto_gate(monkeypatch):
    """auto mode stays OFF below 512-px outputs (same graph as =0)."""
    from munit_tpu.nn.generator import Decoder

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 8, 8, 32), jnp.float32)
    dec = Decoder(n_upsample=1, n_res=1, dim=32, output_dim=3,
                  res_norm="in")
    monkeypatch.setenv("MUNIT_PACKED_TAIL", "0")
    params = dec.init(jax.random.PRNGKey(0), x)
    ref = dec.apply(params, x)
    monkeypatch.setenv("MUNIT_PACKED_TAIL", "auto")
    got = dec.apply(params, x)
    assert float(jnp.max(jnp.abs(got - ref))) == 0.0


def _production_up(x, k5, b5, gamma, beta, activ="relu"):
    act = ops.activation(activ)
    u = ops.upsample_nearest(x, 2)
    y = ops.conv2d(ops.pad2d(u, 2, "reflect"), k5, b5, 1)
    return act(ops.whole_layer_norm(y, gamma, beta))


@pytest.mark.parametrize("hs,ws", [(8, 8), (8, 12), (20, 8)])
def test_up_block_forward_exact(hs, ws):
    from munit_tpu.core.packed_tail import packed_up_block
    rng = np.random.RandomState(0)
    x, k5, b5, gamma, beta, _, _ = _make(rng, 2, hs, ws)
    ref = _production_up(x, k5, b5, gamma, beta)
    got = packed_up_block(x, k5, b5, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_up_block_grad_exact_all_params():
    from munit_tpu.core.packed_tail import packed_up_block
    rng = np.random.RandomState(1)
    x, k5, b5, gamma, beta, _, _ = _make(rng, 2, 12, 8)
    cot = jnp.asarray(rng.randn(2, 24, 16, 16), jnp.float32)

    def loss(fn, *args):
        return jnp.sum(fn(*args) * cot)

    args = (x, k5, b5, gamma, beta)
    gref = jax.grad(lambda *a: loss(_production_up, *a),
                    argnums=tuple(range(5)))(*args)
    ggot = jax.grad(lambda *a: loss(packed_up_block, *a),
                    argnums=tuple(range(5)))(*args)
    for i, (a, b) in enumerate(zip(gref, ggot)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4, err_msg=f"arg {i}")
