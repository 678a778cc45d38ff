"""Conditional real-pretrained-weight tests (docs/REAL_WEIGHTS.md).

This environment has no egress and ships no pretrained weights, so the
semantic/FID/perceptual converters are round-trip tested with RANDOM weights
elsewhere (tests/test_resnet_seg.py, test_eval.py, test_vgg_loss_and_forward).
The day real weight files are available, drop them into
``$MUNIT_REAL_WEIGHTS_DIR`` (default /root/weights) and this file upgrades
them to real-numerics checks with no code changes. Expected filenames:

- ``resnet_34_8s_cityscapes_best.pth`` — the reference's frozen Cityscapes
  segmenter (reference configs/config_256.yaml:53; utils.py:971-982)
- ``inception_v3_google.pth`` — torchvision InceptionV3 state dict
  (reference inception_utils.py:258-308 downloads it via torchvision)
- ``vgg16.pth`` — torchvision VGG16 state dict (reference's loader was
  dead, utils.py:911-914; live here via convert_vgg16_state_dict)

Each test SKIPS (not fails) when its file is absent.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

WEIGHTS_DIR = os.environ.get("MUNIT_REAL_WEIGHTS_DIR", "/root/weights")


def _path(name):
    p = os.path.join(WEIGHTS_DIR, name)
    if not os.path.exists(p):
        pytest.skip(f"real weights not available: {p} "
                    "(set MUNIT_REAL_WEIGHTS_DIR)")
    return p


def _load_sd(path):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def test_resnet34_8s_cityscapes_real():
    """Real Cityscapes segmenter: converted flax forward matches the torch
    mirror of the reference architecture running the SAME real weights."""
    import torch
    from munit_tpu.nn.resnet import ResNet34_8s, convert_resnet34_8s_state_dict
    from tests.test_resnet_seg import TResnet34_8s

    sd = _load_sd(_path("resnet_34_8s_cityscapes_best.pth"))
    rng = np.random.RandomState(0)
    x = rng.rand(1, 128, 128, 3).astype(np.float32)

    tnet = TResnet34_8s()
    tnet.load_state_dict({k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}, strict=True)
    tnet.eval()
    with torch.no_grad():
        want = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    variables = jax.tree.map(jnp.asarray, convert_resnet34_8s_state_dict(sd))
    got = np.asarray(ResNet34_8s(num_classes=19).apply(variables, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_inception_v3_real():
    """Real torchvision InceptionV3: converted trunk produces a finite
    2048-d pool and plausible (non-degenerate) logits."""
    from munit_tpu.eval.inception import (
        InceptionV3, convert_inception_state_dict, inception_preprocess)

    sd = _load_sd(_path("inception_v3_google.pth"))
    params = convert_inception_state_dict(sd)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 299, 299, 3).astype(np.float32) * 2 - 1)
    pool, logits = InceptionV3().apply({"params": params},
                                       inception_preprocess(img))
    pool, logits = np.asarray(pool), np.asarray(logits)
    assert pool.shape == (2, 2048) and np.all(np.isfinite(pool))
    assert logits.shape[-1] == 1000 and np.all(np.isfinite(logits))
    # real weights separate two random images; random weights collapse
    assert np.abs(pool[0] - pool[1]).max() > 1e-4


def test_vgg16_real():
    """Real torchvision VGG16: converted relu5_3 trunk is finite and
    input-sensitive under the reference's Caffe-BGR preprocessing."""
    from munit_tpu.nn.vgg import Vgg16, convert_vgg16_state_dict, \
        vgg_preprocess

    sd = _load_sd(_path("vgg16.pth"))
    params = convert_vgg16_state_dict(sd)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    feats = np.asarray(Vgg16().apply({"params": params},
                                     vgg_preprocess(img)))
    assert feats.shape == (2, 8, 8, 512) and np.all(np.isfinite(feats))
    assert np.abs(feats[0] - feats[1]).max() > 1e-4
