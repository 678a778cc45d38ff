"""Int8 (W8A8) quantized-inference tests (core/ops.py conv_quant).

Three modes: dynamic (per-dispatch per-tensor activation scale), record
(full-precision calibration emitting per-site max|x|), static (calibrated
per-site scales baked as constants). Weight scales are always per-output-
channel. Pinned here:
- EXACT when both operands already sit on their int8 grids (the machinery
  introduces no error of its own);
- close to f32 through a norm-bounded conv chain (the production use);
- the trace-time scope composes with jit and leaves co-traced full-precision
  convs untouched;
- the s2d-rescued conv path quantizes its rearranged kernel per packed
  channel and stays close;
- a full guided translate through the real generator (packed tail + s2d
  stems) stays close to the f32 output.
"""

import numpy as np
import jax
import jax.numpy as jnp

from munit_tpu.core import ops


def test_int8_exact_on_grid():
    rng = np.random.RandomState(0)
    b, h, w, cin, cout, k = 2, 10, 10, 8, 8, 3
    sx = np.float32(0.037)
    sw = (0.002 + 0.01 * rng.rand(cout)).astype(np.float32)
    xi = rng.randint(-127, 128, size=(b, h, w, cin)).astype(np.float32)
    xi.flat[0] = 127.0  # pin the dynamic max to exactly 127*sx
    ki = rng.randint(-127, 128, size=(k, k, cin, cout)).astype(np.float32)
    ki[0, 0, 0, :] = 127.0  # pin every per-channel max
    x = jnp.asarray(xi * sx)
    kern = jnp.asarray(ki * sw)

    ref = ops.conv2d(x, kern, None, 1)
    with ops.conv_quant(all_convs=True):
        got = ops.conv2d(x, kern, None, 1)
    # integer sums stay well inside f32-exact range at these sizes
    d = float(jnp.max(jnp.abs(got - ref)))
    assert d <= 1e-4 * max(float(jnp.max(jnp.abs(ref))), 1.0), d


def test_quant_scope_restores_and_composes_with_jit():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    kern = jnp.asarray(rng.randn(3, 3, 4, 4) * 0.1, jnp.float32)

    @jax.jit
    def mixed(x, kern):
        full = ops.conv2d(x, kern, None, 1)           # full precision
        with ops.conv_quant(all_convs=True):
            quant = ops.conv2d(x, kern, None, 1)      # quantized
        return full, quant

    full, quant = mixed(x, kern)
    ref = ops.conv2d(x, kern, None, 1)
    assert float(jnp.max(jnp.abs(full - ref))) == 0.0
    dq = float(jnp.max(jnp.abs(quant - ref)))
    assert 0 < dq < 0.05 * float(jnp.max(jnp.abs(ref)))
    # scope restored (incl. on exceptions)
    try:
        with ops.conv_quant(all_convs=True):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert ops._QUANT_STATE is None


def test_record_then_static_matches_dynamic_scales():
    """Calibrate (record) on a batch, then run static with those scales:
    on the SAME input, static must agree with dynamic bit-for-bit for the
    first conv (same sx) and stay close end-to-end."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 12, 12, 4), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, 4, 8) * 0.2, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 8, 3) * 0.2, jnp.float32)

    def chain(x):
        y = ops.conv2d(ops.pad2d(x, 1, "reflect"), k1, None, 1)
        y = jax.nn.relu(ops.instance_norm(y))
        return ops.conv2d(ops.pad2d(y, 1, "reflect"), k2, None, 1)

    rec = []
    with ops.conv_quant(record=rec, all_convs=True):
        ref = chain(x)  # record mode runs FULL precision
    assert len(rec) == 2
    ref_plain = chain(x)
    assert float(jnp.max(jnp.abs(ref - ref_plain))) == 0.0

    scales = [float(r) for r in rec]
    with ops.conv_quant(scales=scales, all_convs=True):
        got_static = chain(x)
    with ops.conv_quant(all_convs=True):
        got_dyn = chain(x)
    # first conv shares sx exactly; downstream drift stays tiny
    d = float(jnp.max(jnp.abs(got_static - got_dyn)))
    assert d < 5e-2 * max(float(jnp.max(jnp.abs(ref_plain))), 1.0), d
    err = float(jnp.mean(jnp.abs(got_static - ref_plain)))
    assert err < 0.05, err


def test_static_site_count_mismatch_raises():
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 4, 4) * 0.1, jnp.float32)
    import pytest
    with pytest.raises(ValueError, match="no calibrated scale"):
        with ops.conv_quant(scales=[1.0], all_convs=True):
            y = ops.conv2d(x, k, None, 1)
            ops.conv2d(y, k, None, 1)


def test_quant_close_through_norm_bounded_chain():
    """conv -> IN -> relu -> conv -> tanh, O(1) activations like the
    generator's: per-tensor dynamic scales hold the error to ~1e-2."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, 8, 16) * 0.2, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 16, 3) * 0.2, jnp.float32)

    def chain(x):
        y = ops.conv2d(ops.pad2d(x, 1, "reflect"), k1, None, 1)
        y = jax.nn.relu(ops.instance_norm(y))
        y = ops.conv2d(ops.pad2d(y, 1, "reflect"), k2, None, 1)
        return jnp.tanh(y)

    ref = chain(x)
    with ops.conv_quant(all_convs=True):
        got = chain(x)
    err = float(jnp.mean(jnp.abs(got - ref)))
    assert err < 0.02, err
    assert float(jnp.max(jnp.abs(got - ref))) < 0.15


def test_quant_s2d_conv_close():
    """The s2d rescue feeds conv2d a phase-rearranged kernel; per-packed-
    channel weight scales must keep the path close to the f32 s2d conv."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 3), jnp.float32)
    kern = jnp.asarray(rng.randn(7, 7, 3, 16) * 0.1, jnp.float32)
    ref = ops.conv2d_s2d(x, kern, None, f=4, pad=3)
    with ops.conv_quant(all_convs=True):
        got = ops.conv2d_s2d(x, kern, None, f=4, pad=3)
    rms = float(jnp.sqrt(jnp.mean(ref * ref)))
    err = float(jnp.mean(jnp.abs(got - ref)))
    assert err < 0.03 * max(rms, 1.0), (err, rms)


def test_generator_guided_translate_quant():
    """Full inference path (encode + decode, packed tail + s2d stems) under
    the quant scope: finite, right shape, close to the f32 output."""
    from munit_tpu.config import validate
    from munit_tpu.train import MUNITTrainer

    conf = validate({
        "gen_state": 1, "guided": 1, "batch_size": 1,
        "crop_image_height": 64, "crop_image_width": 64, "new_size": 64,
        "gen": {"dim": 16, "mlp_dim": 32, "style_dim": 8, "activ": "relu",
                "n_downsample": 2, "n_res": 2, "pad_type": "reflect"},
    })
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0), image_size=64)
    gen, params = tr.gen, tr.state["gen"]
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 64, 64, 3) * 0.5, jnp.float32)
    s = jnp.asarray(rng.randn(2, 64, 64, 3) * 0.5, jnp.float32)

    def translate(x, s, quant):
        with ops.conv_quant(quant, all_convs=True):
            c, _ = gen.encode(params, x, 1)
            _, sb = gen.encode(params, s, 2)
            return gen.decode(params, c, sb, 2)

    ref = translate(x, s, False)
    got = jax.jit(lambda x, s: translate(x, s, True))(x, s)
    assert got.shape == ref.shape
    assert bool(jnp.all(jnp.isfinite(got)))
    # tanh outputs in [-1,1]: demand agreement well under perceptual levels
    err = float(jnp.mean(jnp.abs(got - ref)))
    assert err < 0.05, err
