"""config_HD smoke (VERDICT r1 #6): the shipped HD YAML drives the trainer.

Real 512² HD training is exercised on the TPU (tools/bench_hd.py — 7.87
img/s/chip at batch 2, BENCH.md); on the CPU test backend this asserts
(a) the full train-step graph BUILDS at the true 512² crop shapes
(abstract eval, no FLOPs) and (b) an executed dis+gen step on the HD
config with only the crop scaled down.

Reference: configs/config_HD.yaml:73-75 (new_size 600, 512² crops) —
stale upstream (missing the adaptation block, would KeyError the
reference trainer); our validate() injects the defaults (SURVEY §2.7).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from munit_tpu.config import get_config, validate
from munit_tpu.train import MUNITTrainer


@pytest.fixture(scope="module")
def hd_conf():
    return get_config("configs/config_HD.yaml")


def _trainer(conf):
    tr = MUNITTrainer(validate(conf), jax.random.PRNGKey(0))
    if tr.semantic_w:
        crop = conf["crop_image_height"]
        tr.load_segmenter(tr.seg_model_def.init(
            jax.random.PRNGKey(1), jnp.zeros((1, crop, crop, 3))))
    return tr


def test_config_hd_graph_builds_at_512(hd_conf):
    conf = dict(hd_conf, batch_size=1)
    tr = _trainer(conf)
    crop = conf["crop_image_height"]
    assert crop == 512, "config_HD.yaml crop changed?"
    x = jax.ShapeDtypeStruct((1, crop, crop, 3), jnp.float32)
    m = jax.ShapeDtypeStruct((1, crop, crop, 1), jnp.float32)
    lr = jax.ShapeDtypeStruct((), jnp.float32)
    ex = jax.ShapeDtypeStruct((), jnp.bool_)
    # abstract-trace both steps at TRUE HD shapes — shape/dtype/rank errors
    # and trace-time assertions all fire here without doing the FLOPs
    out = jax.eval_shape(tr._dis_step_impl, tr.state, x, x, lr, ex)
    assert out[1]["loss_dis_total"].shape == ()
    import functools
    gen_step = functools.partial(tr._gen_step_impl, synth=False,
                                 has_sem_gt=False)  # static under jit too
    out = jax.eval_shape(gen_step, tr.state, tr.frozen, x, x, m, m, None,
                         None, lr, ex)
    assert out[1]["loss_gen_total"].shape == ()


def test_hd_stage_remat_policy_matches_no_remat(hd_conf):
    """remat="hd" (pads + decoder upsample-stage buffers dropped, the HD
    batch-8 fit policy — VERDICT r2 #5) must only change scheduling, never
    math: one gen step under the policy matches the no-remat step."""
    conf = dict(hd_conf, batch_size=2, new_size=72,
                crop_image_height=64, crop_image_width=64, semantic_w=0)
    conf["gen"] = dict(conf["gen"], dim=16, mlp_dim=32)
    conf["dis"] = dict(conf["dis"], dim=16, n_layer=2, num_scales=2)
    rng = np.random.RandomState(3)
    x_a = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    x_b = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    mask = jnp.asarray((rng.rand(2, 64, 64, 1) > 0.5).astype(np.float32))

    metrics, grads = [], []
    for remat in (None, "hd"):
        tr = MUNITTrainer(validate(conf), jax.random.PRNGKey(2), remat=remat)
        tr.iterations = 0
        m = tr.gen_update(x_a, x_b, mask, mask)   # executes under the policy
        metrics.append(float(m["loss_gen_total"]))
        tr2 = MUNITTrainer(validate(conf), jax.random.PRNGKey(2), remat=remat)
        grads.append(tr2.dis_gen_grads(x_a, x_b, mask, mask))
    np.testing.assert_allclose(metrics[0], metrics[1], rtol=1e-6)
    # PRE-OPTIMIZER gradients: remat reorders f32 summation only, so these
    # agree to float tolerance — no Adam m/√v step to amplify ~0 gradients
    # into ±lr first-step coin flips (the same principle as the
    # gradient-level spatial parity test, tests/test_dist.py)
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_config_hd_steps_at_reduced_crop(hd_conf):
    conf = dict(hd_conf, batch_size=2, new_size=72,
                crop_image_height=64, crop_image_width=64)
    conf["gen"] = dict(conf["gen"], dim=16, mlp_dim=32)
    conf["dis"] = dict(conf["dis"], dim=16, n_layer=2, num_scales=2)
    tr = _trainer(conf)
    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    x_b = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    mask = jnp.asarray((rng.rand(2, 64, 64, 1) > 0.5).astype(np.float32))
    tr.iterations = 0
    md = tr.dis_update(x_a, x_b)
    mg = tr.gen_update(x_a, x_b, mask, mask)
    for k, v in {**md, **mg}.items():
        assert np.isfinite(float(v)), f"{k} not finite under config_HD"
