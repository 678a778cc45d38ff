"""ResNet-18 binary flood classifier (load_flood_classifier,
utils.py:917-930): torchvision resnet18 trunk + 2-way FC head. The reference
never calls it from an entry point (experiment described in the project
write-up); provided for inventory parity and usable as a quality metric.

Frozen inference only (BN running stats)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from munit_tpu.core import ops


def _conv(x, k, stride=1, padding=0):
    if padding:
        x = ops.pad2d(x, padding, "zero")
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


class _BN(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.features)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.features)).value
        return ops.batch_norm_inference(x, mean, var, scale, bias)


class _Block(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        k1 = self.param("conv1", nn.initializers.kaiming_normal(),
                        (3, 3, x.shape[-1], self.planes))
        out = jax.nn.relu(_BN(self.planes, name="bn1")(
            _conv(x, k1, self.stride, 1)))
        k2 = self.param("conv2", nn.initializers.kaiming_normal(),
                        (3, 3, self.planes, self.planes))
        out = _BN(self.planes, name="bn2")(_conv(out, k2, 1, 1))
        if self.stride != 1 or x.shape[-1] != self.planes:
            kd = self.param("down_conv", nn.initializers.kaiming_normal(),
                            (1, 1, x.shape[-1], self.planes))
            identity = _BN(self.planes, name="down_bn")(_conv(x, kd, self.stride))
        return jax.nn.relu(out + identity)


_LAYERS = [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)]


class FloodClassifier(nn.Module):
    """Input: ImageNet-normalized NHWC. Output: (B, 2) logits."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, x):
        k = self.param("conv1", nn.initializers.kaiming_normal(), (7, 7, 3, 64))
        x = jax.nn.relu(_BN(64, name="bn1")(_conv(x, k, 2, 3)))
        x = ops.max_pool(x, 3, 2, 1)
        for li, (planes, blocks, stride) in enumerate(_LAYERS):
            for bi in range(blocks):
                x = _Block(planes, stride if bi == 0 else 1,
                           name=f"layer{li + 1}_{bi}")(x)
        x = jnp.mean(x, axis=(1, 2))
        kw = self.param("fc_kernel", nn.initializers.kaiming_normal(),
                        (512, self.num_classes))
        kb = self.param("fc_bias", nn.initializers.zeros, (self.num_classes,))
        return x @ kw + kb


def flood_classifier_transform(img):
    """transform_torchVar (utils.py:177-189): PIL → resize 256 → center-crop
    224 → ImageNet-normalized NHWC float32 (the flood classifier's input)."""
    from munit_tpu.data import transforms as T
    img = T.resize_shorter(img.convert("RGB"), 256)
    w, h = img.size
    img = T.crop(img, (h - 224) // 2, (w - 224) // 2, 224, 224)
    arr = T.to_array01(img)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (arr - mean) / std


def convert_resnet18_state_dict(sd) -> dict:
    """torchvision resnet18 state_dict (with replaced 2-way fc) → variables."""
    params: dict = {}
    stats: dict = {}

    def conv_w(k):
        return np.transpose(sd[k], (2, 3, 1, 0))

    def bn(tkey):
        return ({"scale": sd[f"{tkey}.weight"], "bias": sd[f"{tkey}.bias"]},
                {"mean": sd[f"{tkey}.running_mean"],
                 "var": sd[f"{tkey}.running_var"]})

    params["conv1"] = conv_w("conv1.weight")
    params["bn1"], stats["bn1"] = bn("bn1")
    for li, (planes, blocks, stride) in enumerate(_LAYERS):
        for bi in range(blocks):
            t = f"layer{li + 1}.{bi}"
            scope = f"layer{li + 1}_{bi}"
            blk, bst = {}, {}
            blk["conv1"] = conv_w(f"{t}.conv1.weight")
            blk["conv2"] = conv_w(f"{t}.conv2.weight")
            blk["bn1"], bst["bn1"] = bn(f"{t}.bn1")
            blk["bn2"], bst["bn2"] = bn(f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = conv_w(f"{t}.downsample.0.weight")
                blk["down_bn"], bst["down_bn"] = bn(f"{t}.downsample.1")
            params[scope] = blk
            stats[scope] = bst
    params["fc_kernel"] = np.transpose(sd["fc.weight"], (1, 0))
    params["fc_bias"] = sd["fc.bias"]
    return {"params": params, "batch_stats": stats}
