"""Config system: all shipped configs load + validate; defaults injected;
stale-config resilience (the reference KeyErrors on config_HD's missing
adaptation block — SURVEY.md §2.7)."""

import glob

import pytest
import yaml

from munit_tpu.config import get_config, validate, flatten_opts


def test_all_shipped_configs_load():
    paths = glob.glob("configs/*.yaml") + glob.glob("configs/final_test/*.yaml")
    assert len(paths) >= 9
    for p in paths:
        conf = get_config(p)
        assert conf["gen"]["style_dim"] == 16
        assert "adaptation" in conf


def test_reference_configs_parse():
    # the reference's own YAMLs (incl. the stale HD config) validate cleanly
    for p in glob.glob("/root/reference/configs/**/*.yaml", recursive=True):
        conf = get_config(p)
        assert conf["optimizer"] == "adam"  # utils.py:755-757 default
        assert "adaptation" in conf


def test_defaults_and_overrides():
    conf = validate({"lr": 0.001})
    assert conf["lr"] == 0.001
    assert conf["beta1"] == 0.5
    assert conf["adaptation"]["classif_frequency"] == 15
    conf2 = validate({"adaptation": {"adv_lambda": 3}})
    assert conf2["adaptation"]["adv_lambda"] == 3
    assert conf2["adaptation"]["dfeat_lambda"] == 0  # untouched default


def test_validation_errors():
    with pytest.raises(ValueError):
        validate({"gen_state": 5})
    with pytest.raises(TypeError):
        validate({"batch_size": "two"})
    with pytest.raises(ValueError):
        validate({"dis": {"gan_type": "wgan"}})


def test_dis_pyramid_zero_size_rejected():
    """32² crops with the shipped dis (num_scales=3, n_layer=4) leave the
    smallest pyramid scale with a zero-size logit map — every GAN loss
    becomes mean-of-empty NaN (the torch reference fails identically,
    silently). validate() warns (eval configs never build D); the trainer
    refuses to construct."""
    with pytest.warns(UserWarning, match="zero-size logit map"):
        conf = validate({"crop_image_height": 32, "crop_image_width": 32})
    import jax
    from munit_tpu.train import MUNITTrainer
    with pytest.raises(ValueError, match="zero-size logit map"):
        MUNITTrainer(conf, jax.random.PRNGKey(0))
    # 64² survives (smallest scale 16 → 4 convs → 1 pixel)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        validate({"crop_image_height": 64, "crop_image_width": 64})


def test_flatten_opts():
    flat = flatten_opts({"a": {"b": {"c": 2}, "e": 4}, "f": 5})
    assert flat == {"a.b.c": 2, "a.e": 4, "f": 5}


def test_main_dispatcher_lists_and_rejects():
    from munit_tpu.__main__ import main, COMMANDS
    import importlib
    assert main(["--help"]) == 0
    assert main(["not_a_command"]) == 2
    for mod, _ in COMMANDS.values():   # every target module imports + has main
        assert callable(getattr(importlib.import_module(mod), "main"))
