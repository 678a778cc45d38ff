"""Training-engine smoke tests: tiny config, deterministic synthetic data.

Covers: dis/gen steps run and return finite metrics, params change, ExtraAdam
cadence, masked cycle loss path, aux classifier steps, synthetic-pair path
with semantic GT, guided vs random-style paths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from munit_tpu.config import validate
from munit_tpu.train import MUNITTrainer

CROP = 32


def tiny_conf(**over):
    conf = {
        "crop_image_height": CROP, "crop_image_width": CROP, "new_size": CROP,
        "gen": {"dim": 16, "mlp_dim": 32, "style_dim": 8, "activ": "relu",
                "n_downsample": 2, "n_res": 2, "pad_type": "reflect"},
        "dis": {"dim": 16, "norm": "none", "activ": "lrelu", "n_layer": 3,
                "gan_type": "lsgan", "num_scales": 2, "pad_type": "reflect"},
        "gen_state": 1, "guided": 1, "recon_mask": 1, "semantic_w": 0,
        "batch_size": 2, "display_size": 2,
    }
    conf.update(over)
    return validate(conf)


def batch(rng, b=2):
    x_a = jnp.asarray(rng.randn(b, CROP, CROP, 3).astype(np.float32)) * 0.5
    x_b = jnp.asarray(rng.randn(b, CROP, CROP, 3).astype(np.float32)) * 0.5
    mask = jnp.asarray((rng.rand(b, CROP, CROP, 1) > 0.7).astype(np.float32))
    return x_a, x_b, mask


def leaves_allclose(a, b):
    return all(np.allclose(x, y) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_dis_gen_steps_update_params():
    conf = tiny_conf()
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x_a, x_b, mask = batch(rng)

    gen_before = jax.tree.map(np.asarray, tr.state["gen"])
    dis_before = jax.tree.map(np.asarray, tr.state["dis_a"])

    tr.iterations = 0
    md = tr.dis_update(x_a, x_b)
    mg = tr.gen_update(x_a, x_b, mask, mask)

    for m in (md, mg):
        for k, v in m.items():
            assert np.isfinite(np.asarray(v)), f"{k} not finite"
    assert not leaves_allclose(gen_before, tr.state["gen"])
    assert not leaves_allclose(dis_before, tr.state["dis_a"])
    assert md["loss_dis_total"] > 0
    assert mg["loss_gen_total"] > 0


def test_gen_step_random_style_unguided():
    conf = tiny_conf(guided=0, recon_mask=0)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    x_a, x_b, _ = batch(rng)
    tr.iterations = 0
    m = tr.gen_update(x_a, x_b)
    assert np.isfinite(np.asarray(m["loss_gen_total"]))


def test_gen_state_0_two_autoencoders():
    conf = tiny_conf(gen_state=0, guided=0, recon_mask=0)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(2))
    assert set(tr.state["gen"].keys()) == {"a", "b"}
    rng = np.random.RandomState(2)
    x_a, x_b, _ = batch(rng)
    tr.iterations = 0
    tr.dis_update(x_a, x_b)
    m = tr.gen_update(x_a, x_b)
    assert np.isfinite(np.asarray(m["loss_gen_total"]))


def test_extra_adam_cadence_two_batches_one_update():
    conf = tiny_conf(optimizer="extra_adam", recon_mask=0)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(3))
    rng = np.random.RandomState(3)
    x_a, x_b, _ = batch(rng)

    tr.iterations = 0          # even → extrapolation
    tr.dis_update(x_a, x_b)
    assert bool(tr.state["dis_opt"].has_copy)
    tr.iterations = 1          # odd → step
    tr.dis_update(x_a, x_b)
    assert not bool(tr.state["dis_opt"].has_copy)


def test_synth_pair_step_with_semantic_gt():
    conf = tiny_conf(recon_synth_w=1.0)
    conf["adaptation"]["sem_seg_lambda"] = 1.0
    conf = validate(conf)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(4))
    rng = np.random.RandomState(4)
    x_a, x_b, mask = batch(rng)
    sem = jnp.asarray(rng.randint(0, 10, (2, CROP, CROP)).astype(np.int32))

    tr.iterations = 0
    m = tr.gen_update(x_a, x_b, mask, mask, synth=True,
                      sem_gt_a=sem, sem_gt_b=sem)
    assert np.isfinite(np.asarray(m["loss_gen_recon_synth"]))
    ms = tr.segmentation_head_update(x_a, x_b, sem, sem)
    assert np.isfinite(np.asarray(ms["loss_semantic_head"]))


def test_aux_classifier_steps():
    conf = tiny_conf(domain_adv_w=0.5)
    conf["adaptation"]["dfeat_lambda"] = 1.0
    conf["adaptation"]["adv_lambda"] = 1.0
    conf["adaptation"]["output_classifier_lambda"] = 1.0
    conf["adaptation"]["output_adv_lambda"] = 1.0
    conf = validate(conf)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(5))
    rng = np.random.RandomState(5)
    x_a, x_b, mask = batch(rng)

    tr.iterations = 0
    m1 = tr.domain_classifier_update(x_a, x_b)
    assert 0.0 <= float(m1["prob_a_as_a"]) <= 1.0
    m2 = tr.domain_classifier_sr_update(x_a, x_b, domain_synth=False, lamb=1.0)
    assert np.isfinite(np.asarray(m2["loss_classifier_sr"]))
    m3 = tr.output_domain_classifier_sr_update(x_a, x_a, x_b, x_b)
    assert np.isfinite(np.asarray(m3["loss_output_classifier_sr"]))
    # gen step exercises the adversarial (fool) terms of all of the above
    m4 = tr.gen_update(x_a, x_b, mask, mask)
    assert np.isfinite(np.asarray(m4["loss_classifier_adv_sr"]))
    assert np.isfinite(np.asarray(m4["loss_output_classifier_adv_sr"]))
    assert np.isfinite(np.asarray(m4["domain_adv_loss_gen"]))


def test_semantic_loss_with_random_frozen_segmenter():
    conf = tiny_conf(semantic_w=3.0)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(6))
    seg_vars = tr.seg_model_def.init(
        jax.random.PRNGKey(7), jnp.zeros((1, CROP, CROP, 3)))
    tr.load_segmenter(seg_vars)
    rng = np.random.RandomState(6)
    x_a, x_b, mask = batch(rng)
    tr.iterations = 0
    m = tr.gen_update(x_a, x_b, mask, mask)
    assert np.isfinite(np.asarray(m["loss_sem_seg"]))
    assert float(m["loss_sem_seg"]) > 0


def test_sample_and_sample_fid_shapes():
    conf = tiny_conf()
    tr = MUNITTrainer(conf, jax.random.PRNGKey(8))
    rng = np.random.RandomState(8)
    x_a, x_b, _ = batch(rng)
    out = tr.sample(x_a, x_b)
    assert len(out) == 8
    for img in out:
        assert img.shape == x_a.shape
    fid_imgs = tr.sample_fid(x_a, x_b)
    assert fid_imgs.shape == x_a.shape


def test_loss_decreases_on_fixed_batch():
    # A few gen steps on the same batch should reduce the total gen loss.
    conf = tiny_conf(recon_mask=0, gan_w=0)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(9))
    rng = np.random.RandomState(9)
    x_a, x_b, _ = batch(rng)
    first = last = None
    for it in range(12):
        tr.iterations = it
        m = tr.gen_update(x_a, x_b)
        v = float(m["loss_gen_total"])
        first = v if first is None else first
        last = v
    assert last < first


def test_sample_with_seg_overlays():
    conf = tiny_conf(semantic_w=3.0)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(10))
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(11), jnp.zeros((1, CROP, CROP, 3))))
    rng = np.random.RandomState(10)
    x_a, x_b, _ = batch(rng)
    out = tr.sample(x_a, x_b)
    # 12-column layout (trainer.py:911-928): overlays at indices 2,4,8,10
    assert len(out) == 12
    for idx in (2, 4, 8, 10):
        overlay = np.asarray(out[idx])
        assert overlay.shape == x_a.shape
        assert overlay.min() >= 0.0 and overlay.max() <= 1.0
