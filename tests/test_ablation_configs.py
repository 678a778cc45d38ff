"""Ablation-grid smoke: each Final_test flavor builds a trainer and runs its
full per-iteration update set at tiny scale (the paper's Baseline / FeatureDA
/ Output_DA axes — SURVEY.md §2.7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from munit_tpu.config import get_config, validate

CROP = 32
TINY = {
    "new_size": CROP, "crop_image_height": CROP, "crop_image_width": CROP,
    "batch_size": 2,
    "gen": {"dim": 16, "mlp_dim": 32, "style_dim": 8, "activ": "relu",
            "n_downsample": 2, "n_res": 2, "pad_type": "reflect"},
    "dis": {"dim": 16, "norm": "none", "activ": "lrelu", "n_layer": 3,
            "gan_type": "lsgan", "num_scales": 2, "pad_type": "reflect"},
}


ALL_ABLATIONS = ["Baseline", "Baseline+seg", "FeatureDA", "FeatureDA+seg",
                 "FeatureDA+height30_seg", "Output_DA", "Output_DA+seg"]


@pytest.mark.parametrize("name", ALL_ABLATIONS)
def test_ablation_config_builds_trainer(name):
    """Every grid config loads, validates, and constructs its trainer with
    the right optional components (full-step coverage of each component
    lives in test_trainer.py — this keeps the grid cheap)."""
    from munit_tpu.train import MUNITTrainer
    conf = get_config(f"configs/final_test/{name}.yaml")
    conf.update(TINY)
    conf = validate(conf)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    ad = conf["adaptation"]
    assert tr.use_classifier_sr == (ad["dfeat_lambda"] > 0)
    assert tr.use_output_classifier_sr == (ad["output_classifier_lambda"] > 0)
    if tr.use_classifier_sr:
        assert "classifier_sr_a" in tr.state
    if tr.use_output_classifier_sr:
        assert "output_classifier_sr_a" in tr.state


def test_featureda_full_iteration():
    """One grid flavor end-to-end: FeatureDA exercises the sr-classifier path
    plus the synthetic-pair update with semantic GT."""
    from munit_tpu.train import MUNITTrainer
    conf = get_config("configs/final_test/FeatureDA.yaml")
    conf.update(TINY)
    conf = validate(conf)

    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))

    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32))
    x_b = jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(2, CROP, CROP, 1) > 0.5).astype(np.float32))
    sem = jnp.asarray(rng.randint(0, 9, (2, CROP, CROP)).astype(np.int32))

    tr.iterations = 0
    metrics = dict(tr.dis_update(x_a, x_b))
    metrics.update(tr.gen_update(x_a, x_b, mask, mask, synth=True,
                                 sem_gt_a=sem, sem_gt_b=sem))
    metrics.update(tr.domain_classifier_sr_update(
        x_a, x_b, domain_synth=False,
        lamb=conf["adaptation"]["dfeat_lambda"]))
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
