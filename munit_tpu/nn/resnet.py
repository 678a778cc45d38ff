"""Dilated ResNet-34-8s semantic segmenter, TPU-native (frozen inference).

Mirrors the reference's fully-convolutional dilated ResNet
(/root/reference/scripts/resnet.py:17-250 + utils.py:933-968):

- stem: 7x7 s2 conv (no bias) + BN + relu + 3x3 s2 maxpool (pad 1);
- layer1..4 of BasicBlocks [3,4,6,3]; once the target output stride (8) is
  reached, further stride-2 stages become dilated (layer3 dil 2, layer4 dil 4)
  with "full padding" so spatial size is preserved (resnet.py:17-41);
- 1x1 conv head to ``num_classes`` then bilinear upsample to input size
  (utils.py:957-967; align_corners=False per torch F.interpolate defaults).

This net is only ever used FROZEN (trainer.py:137-143), so batch norm runs in
inference mode with converted running stats. The trainable ``SegmentationHead``
(trainer.py:203-223 — resnet layer4 + avgpool(7,p3,s1) + fresh 1x1 conv→10)
uses train-mode batch norm via flax BatchNorm.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from munit_tpu.core import ops


def _dilated_padding(dilation: int) -> int:
    """Full padding for a dilated 3x3 conv (resnet.py:17-41)."""
    upsampled = (3 - 1) * (dilation - 1) + 3
    return (upsampled - 1) // 2


def _conv(x, kernel, stride=1, dilation=1, padding=0):
    """Respects the global conv numerics knobs (ops.set_conv_compute): the
    segmenter runs 4× per gen step, so bf16-MXU mode matters as much here as
    in the generator (r1 hardcoded HIGHEST → f32 multi-pass convs ≈ 20% MFU)."""
    if padding:
        x = ops.pad2d(x, padding, "zero")
    return ops.conv2d(x, kernel, stride=stride, dilation=dilation)


class _FrozenBN(nn.Module):
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


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    train_bn: bool = False   # True → flax BatchNorm (trainable head)

    def _bn(self, name):
        if self.train_bn:
            return nn.BatchNorm(use_running_average=False, momentum=0.9,
                                epsilon=1e-5, name=name)
        return _FrozenBN(self.planes, name=name)

    @nn.compact
    def __call__(self, x):
        identity = x
        pad = _dilated_padding(self.dilation)
        k1 = self.param("conv1", nn.initializers.kaiming_normal(),
                        (3, 3, x.shape[-1], self.planes))
        out = _conv(x, k1, self.stride, self.dilation, pad)
        out = self._bn("bn1")(out)
        out = jax.nn.relu(out)
        k2 = self.param("conv2", nn.initializers.kaiming_normal(),
                        (3, 3, self.planes, self.planes))
        out = _conv(out, k2, 1, self.dilation, pad)
        out = self._bn("bn2")(out)
        if self.has_downsample:
            kd = self.param("down_conv", nn.initializers.kaiming_normal(),
                            (1, 1, x.shape[-1], self.planes))
            identity = _conv(x, kd, self.stride)
            if self.train_bn:
                identity = nn.BatchNorm(use_running_average=False, momentum=0.9,
                                        epsilon=1e-5, name="down_bn")(identity)
            else:
                identity = _FrozenBN(self.planes, name="down_bn")(identity)
        return jax.nn.relu(out + identity)


# (planes, blocks, stride, dilation) per layer for output_stride=8 resnet34:
# stride-2 stages past stride 8 become dilation 2 then 4 (resnet.py:197-250)
_LAYERS_8S = [(64, 3, 1, 1), (128, 4, 2, 1), (256, 6, 1, 2), (512, 3, 1, 4)]


class ResNet34_8s(nn.Module):
    """Frozen Cityscapes segmenter. Input NHWC in ImageNet normalization;
    output (B, H, W, num_classes) logits upsampled to input size."""

    num_classes: int = 19

    @nn.compact
    def __call__(self, x):
        in_hw = (x.shape[1], x.shape[2])
        k = self.param("conv1", nn.initializers.kaiming_normal(), (7, 7, 3, 64))
        x = _conv(x, k, stride=2, padding=3)
        x = _FrozenBN(64, name="bn1")(x)
        x = jax.nn.relu(x)
        x = ops.max_pool(x, 3, 2, 1)
        inplanes = 64
        for li, (planes, blocks, stride, dilation) in enumerate(_LAYERS_8S):
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or inplanes != planes)
                x = _BasicBlock(planes, s, dilation, ds,
                                name=f"layer{li + 1}_{bi}")(x)
            inplanes = planes
        kf = self.param("fc_kernel",
                        lambda key, s: jax.random.normal(key, s) * 0.01,
                        (1, 1, 512, self.num_classes))
        bf = self.param("fc_bias", nn.initializers.zeros, (self.num_classes,))
        x = _conv(x, kf) + bf
        return ops.resize_bilinear(x, in_hw)


class SegmentationHead(nn.Module):
    """Trainable head on content codes (trainer.py:203-223): resnet34_8s
    layer4 (dilation 4) + AvgPool2d(7, pad 3, stride 1) + 1x1 conv → 10."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]  # content codes: 256
        for bi in range(3):
            ds = bi == 0 and inplanes != 512
            x = _BasicBlock(512, 1, 4, ds, train_bn=True,
                            name=f"layer4_{bi}")(x)
            inplanes = 512
        # AvgPool2d(7, padding=3, stride=1) (count_include_pad default True)
        xs = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 7, 7, 1), (1, 1, 1, 1),
            [(0, 0), (3, 3), (3, 3), (0, 0)]) / 49.0
        k = self.param("out_kernel", nn.initializers.kaiming_normal(),
                       (1, 1, 512, self.num_classes))
        b = self.param("out_bias", nn.initializers.zeros, (self.num_classes,))
        return _conv(xs, k) + b


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_resnet34_8s_state_dict(sd):
    """Convert the reference's Resnet34_8s state_dict (keys prefixed
    ``resnet34_8s.``, utils.py:933-960) to {params, batch_stats} for this
    module. Conv weights OIHW→HWIO."""
    p = "resnet34_8s."
    params: dict = {}
    stats: dict = {}

    def conv_w(key):
        return np.transpose(sd[key], (2, 3, 1, 0))

    def put_bn(tkey, scope):
        params.setdefault(scope, {})
        stats.setdefault(scope, {})
        params[scope]["scale"] = sd[f"{tkey}.weight"]
        params[scope]["bias"] = sd[f"{tkey}.bias"]
        stats[scope]["mean"] = sd[f"{tkey}.running_mean"]
        stats[scope]["var"] = sd[f"{tkey}.running_var"]

    params["conv1"] = conv_w(p + "conv1.weight")
    put_bn(p + "bn1", "bn1")
    for li, (planes, blocks, stride, dilation) in enumerate(_LAYERS_8S):
        for bi in range(blocks):
            t = f"{p}layer{li + 1}.{bi}"
            scope = f"layer{li + 1}_{bi}"
            blk = {"conv1": conv_w(f"{t}.conv1.weight"),
                   "conv2": conv_w(f"{t}.conv2.weight")}
            bstats = {}
            for bn in ("bn1", "bn2"):
                blk[bn] = {"scale": sd[f"{t}.{bn}.weight"],
                           "bias": sd[f"{t}.{bn}.bias"]}
                bstats[bn] = {"mean": sd[f"{t}.{bn}.running_mean"],
                              "var": sd[f"{t}.{bn}.running_var"]}
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = conv_w(f"{t}.downsample.0.weight")
                blk["down_bn"] = {"scale": sd[f"{t}.downsample.1.weight"],
                                  "bias": sd[f"{t}.downsample.1.bias"]}
                bstats["down_bn"] = {"mean": sd[f"{t}.downsample.1.running_mean"],
                                     "var": sd[f"{t}.downsample.1.running_var"]}
            params[scope] = blk
            stats[scope] = bstats
    params["fc_kernel"] = np.transpose(sd[p + "fc.weight"], (2, 3, 1, 0))
    params["fc_bias"] = sd[p + "fc.bias"]
    return {"params": params, "batch_stats": stats}


def imagenet_normalize(img01: jax.Array) -> jax.Array:
    """[0,1] NHWC → ImageNet normalization (seg_transform, utils.py:159-174)."""
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    return (img01 - mean) / std


def seg_preprocess(img_pm1: jax.Array) -> jax.Array:
    """[-1,1] model output/input → segmenter input (trainer.py:717-723)."""
    return imagenet_normalize((img_pm1 + 1.0) * 0.5)
