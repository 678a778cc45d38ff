"""Production-numerics mode: bf16 conv operands, f32 everything else."""

import numpy as np

import jax
import jax.numpy as jnp

from munit_tpu.core import ops
from munit_tpu.config import validate
from munit_tpu.train import MUNITTrainer


def test_bf16_conv_mode_trains():
    try:
        ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)
        conf = validate({
            "gen_state": 1, "guided": 1, "recon_mask": 0, "batch_size": 2,
            "crop_image_height": 32, "crop_image_width": 32, "new_size": 32,
            "gen": {"dim": 16, "mlp_dim": 32, "style_dim": 8, "activ": "relu",
                    "n_downsample": 2, "n_res": 2, "pad_type": "reflect"},
            "dis": {"dim": 16, "norm": "none", "activ": "lrelu", "n_layer": 3,
                    "gan_type": "lsgan", "num_scales": 2,
                    "pad_type": "reflect"},
        })
        tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        x_a = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        x_b = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        tr.iterations = 0
        md = tr.dis_update(x_a, x_b)
        mg = tr.gen_update(x_a, x_b)
        assert np.isfinite(float(md["loss_dis_total"]))
        assert np.isfinite(float(mg["loss_gen_total"]))
        # params stay f32
        assert all(l.dtype == jnp.float32
                   for l in jax.tree.leaves(tr.state["gen"]))
    finally:
        ops.set_conv_compute(None, jax.lax.Precision.HIGHEST)


def test_bf16_forward_close_to_f32():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    xp = ops.pad2d(x, 1, "zero")
    want = np.asarray(ops.conv2d(xp, w))
    try:
        ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)
        got = np.asarray(ops.conv2d(xp, w))
        assert got.dtype == np.float32
    finally:
        ops.set_conv_compute(None, jax.lax.Precision.HIGHEST)
    assert np.mean(np.abs(got - want)) / (np.mean(np.abs(want)) + 1e-8) < 0.03
