"""YAML config system with schema validation.

The reference loads YAML to a plain dict (utils.py:743-758), injecting only an
``optimizer: adam`` default, and KeyErrors on stale configs (e.g. config_HD.yaml
lacks the ``adaptation:`` block — SURVEY.md §2.7). Here the schema is validated
and defaulted explicitly so every shipped reference config loads.

Schema follows configs/config_256.yaml. Unknown keys are preserved (the
reference passes sub-dicts wholesale into model constructors).
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import yaml

# Defaults make every shipped reference config (config_256, config_HD,
# Final_test/*) load without KeyError. Values = config_256.yaml where that file
# defines them; structural defaults (0 / off) otherwise.
_DEFAULTS: Dict[str, Any] = {
    "image_save_iter": 1000,
    "image_display_iter": 500,
    "display_size": 8,
    "snapshot_save_iter": 5000,
    "log_iter": 1,
    "max_iter": 1000000,
    "batch_size": 1,
    # munit_tpu extension: K>1 averages gradients over K sequential
    # micro-batches of batch_size/K per optimizer step (see
    # train/trainer.py::_accum_grads) — fits large effective batches in
    # one chip's HBM. 1 = reference behavior.
    "grad_accum": 1,
    # with grad_accum > 1: 1 = one shared vjp forward per micro-batch
    # (gen adversarial terms see the PRE-update D — docs/PARITY.md #12b);
    # 0 (default) = the exact two-phase chunked step.
    "accum_shared_fwd": 0,
    # with grad_accum > 1: 1 = chunk the dis-grad computations too (exact
    # either way; an HBM lever for configs where phase A's full-batch
    # inference slabs are the last few hundred MB over capacity).
    "accum_chunk_dis": 0,
    "weight_decay": 0.0001,
    "beta1": 0.5,
    "beta2": 0.999,
    "init": "kaiming",
    "lr": 0.0001,
    "lr_policy": "step",
    "step_size": 100000,
    "gamma": 0.5,
    "gan_w": 3,
    "recon_x_w": 12,
    "recon_s_w": 1,
    "recon_c_w": 2,
    "recon_x_cyc_w": 12,
    "vgg_w": 0,
    "semantic_w": 0,
    "recon_mask": 0,
    "domain_adv_w": 0,
    "synthetic_frequency": -1,
    "recon_synth_w": 0,
    "synthetic_seg_gt": 0,
    "classifier_frequency": 100000,
    "optimizer": "adam",          # utils.py:755-757 default injection
    "gen_state": 0,
    "guided": 0,
    "batch_size_fid": 1,
    "eval_fid": 0,
    "inception_moment_path": None,
    "inception_ckpt_path": None,   # converted InceptionV3 vars (pickle)
    "semantic_ckpt_path": None,
    "class_ckpt_path": None,
    "vgg_model_path": None,
    "ratio_disc_gen": 1,
    "input_dim_a": 3,
    "input_dim_b": 3,
    "num_workers": 8,
    "new_size": 256,
    "crop_image_height": 256,
    "crop_image_width": 256,
    "adaptation": {
        "full_adaptation": 0,
        "output_classifier_lambda": 0,
        "output_adv_lambda": 0,
        "output_classif_freq": 1,
        "adv_lambda": 0,
        "dfeat_lambda": 0,
        "classif_frequency": 15,
        "sem_seg_lambda": 0,
    },
    "gen": {
        "dim": 64,
        "mlp_dim": 256,
        "style_dim": 16,
        "activ": "relu",
        "n_downsample": 2,
        "n_res": 4,
        "pad_type": "reflect",
    },
    "dis": {
        "dim": 64,
        "norm": "none",
        "activ": "lrelu",
        "n_layer": 4,
        "gan_type": "lsgan",
        "num_scales": 3,
        "pad_type": "reflect",
    },
}

_REQUIRED_TYPES = {
    "batch_size": int, "max_iter": int, "lr": (int, float),
    "gen_state": int, "guided": int, "ratio_disc_gen": int,
    "new_size": int, "crop_image_height": int, "crop_image_width": int,
}


def _merge(defaults: Dict[str, Any], user: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(defaults)
    for k, v in user.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def validate(conf: Dict[str, Any]) -> Dict[str, Any]:
    conf = _merge(_DEFAULTS, conf)
    for key, typ in _REQUIRED_TYPES.items():
        if not isinstance(conf[key], typ):
            raise TypeError(f"config key '{key}' must be {typ}, got "
                            f"{type(conf[key]).__name__}: {conf[key]!r}")
    if conf["gen_state"] not in (0, 1):
        raise ValueError(f"gen_state must be 0 or 1, got {conf['gen_state']}")
    if conf["guided"] not in (0, 1):
        raise ValueError(f"guided must be 0 or 1, got {conf['guided']}")
    if conf["dis"]["gan_type"] not in ("lsgan", "nsgan"):
        raise ValueError(f"Unsupported GAN type: {conf['dis']['gan_type']}")
    if conf["lr_policy"] not in ("constant", "step"):
        raise NotImplementedError(
            f"learning rate policy [{conf['lr_policy']}] is not implemented")
    ga = conf["grad_accum"]
    if not isinstance(ga, int) or ga < 1:
        raise ValueError(f"grad_accum must be a positive int, got {ga!r}")
    if conf["batch_size"] % ga:
        raise ValueError(
            f"batch_size ({conf['batch_size']}) must be divisible by "
            f"grad_accum ({ga})")
    if dis_pyramid_floor(conf) < 1:
        # warn here (eval/translate configs never build the discriminator);
        # MUNITTrainer raises at construction — training with this config
        # is guaranteed-NaN (see dis_pyramid_floor)
        import warnings
        warnings.warn(_pyramid_msg(conf), stacklevel=2)
    return conf


def dis_pyramid_floor(conf: Dict[str, Any]) -> int:
    """Output size of the discriminator's SMALLEST pyramid scale.

    The smallest of num_scales avg-pooled inputs must survive n_layer
    stride-2 4x4 convs with at least one output pixel, or its logit map is
    a ZERO-SIZE tensor and every GAN loss is mean-of-empty = NaN (the torch
    reference fails the same way, silently — networks.py:39-77; caught at
    32² crops with the shipped num_scales=3 / n_layer=4)."""
    s = min(conf["crop_image_height"], conf["crop_image_width"])
    for _ in range(conf["dis"]["num_scales"] - 1):
        s = (s - 1) // 2 + 1          # AvgPool2d(3, stride 2, pad 1)
    for _ in range(conf["dis"]["n_layer"]):
        s = (s - 2) // 2 + 1          # Conv2d(k=4, stride 2, pad 1)
    return s


def _pyramid_msg(conf) -> str:
    return (
        f"dis pyramid collapses to a zero-size logit map: crop "
        f"{conf['crop_image_height']}x{conf['crop_image_width']} with "
        f"num_scales={conf['dis']['num_scales']}, "
        f"n_layer={conf['dis']['n_layer']} leaves the smallest scale "
        f"with no output pixels (GAN losses would be NaN). Use a "
        f"larger crop or fewer scales/layers.")


def get_config(path: str) -> Dict[str, Any]:
    """Load + validate a YAML config (get_config, utils.py:743-758)."""
    with open(path) as f:
        conf = yaml.safe_load(f)
    return validate(conf or {})


def flatten_opts(conf: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Flatten nested config for metric-logger parameter dumps
    (utils.py:1395-1435)."""
    out = {}
    for k, v in conf.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_opts(v, prefix=f"{key}."))
        else:
            out[key] = v
    return out
