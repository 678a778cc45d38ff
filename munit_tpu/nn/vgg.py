"""VGG16 relu5_3 trunk for the domain-invariant perceptual loss.

Mirrors networks.py:755-804: 13 3x3 convs + 3 max pools, returning relu5_3
features only. The reference's weight loader is dead (utils.py:911-914 raises
NotImplementedError), so ``vgg_w > 0`` was a dead path there; here the
architecture is live and weights can be converted from any torchvision-format
VGG16 state_dict via ``convert_vgg16_state_dict``.

Input preprocessing (``vgg_preprocess``, utils.py:1051-1063): RGB→BGR,
[-1,1]→[0,255], subtract the Caffe BGR means.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from munit_tpu.core import ops, init

_CFG = [  # (name, out_channels); 'M' = 2x2 max pool
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]


class Vgg16(nn.Module):
    """Returns relu5_3 features (B, H/8, W/8, 512)."""

    @nn.compact
    def __call__(self, x):
        for item in _CFG:
            if item == "M":
                x = ops.max_pool(x, 2, 2)
                continue
            name, cout = item
            k = self.param(f"{name}_kernel", init.kaiming_normal,
                           (3, 3, x.shape[-1], cout))
            b = self.param(f"{name}_bias", init.zeros, (cout,))
            x = jax.nn.relu(ops.conv2d(ops.pad2d(x, 1, "zero"), k, b))
        return x


def vgg_preprocess(batch_pm1: jax.Array) -> jax.Array:
    """[-1,1] RGB NHWC → Caffe-style BGR 0-255 mean-subtracted."""
    bgr = batch_pm1[..., ::-1]
    bgr = (bgr + 1.0) * 255.0 * 0.5
    mean = jnp.asarray([103.939, 116.779, 123.680])
    return bgr - mean


def convert_vgg16_state_dict(sd) -> dict:
    """Map the reference Vgg16 state_dict (keys conv1_1.weight ...) or a
    torchvision features.* VGG16 state_dict to this module's params."""
    params = {}
    tv_order = [k for k in sd if k.endswith("weight")]
    if any(k.startswith("features") for k in sd):
        conv_names = [i[0] for i in _CFG if i != "M"]
        tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        for name, i in zip(conv_names, tv_idx):
            params[f"{name}_kernel"] = np.transpose(
                sd[f"features.{i}.weight"], (2, 3, 1, 0))
            params[f"{name}_bias"] = sd[f"features.{i}.bias"]
    else:
        for item in _CFG:
            if item == "M":
                continue
            name, _ = item
            params[f"{name}_kernel"] = np.transpose(sd[f"{name}.weight"],
                                                    (2, 3, 1, 0))
            params[f"{name}_bias"] = sd[f"{name}.bias"]
    return params
