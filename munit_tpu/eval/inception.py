"""InceptionV3 (torchvision architecture) in Flax, for FID / IS.

Mirrors the reference's WrapInception preprocessing + trunk
(inception_utils.py:27-85): input [-1,1] → [0,1] → ImageNet norm → bilinear
299² with align_corners=True → inception trunk → 2048-d global-avg pool
vector; the fc head provides logits for IS (test_batch.py:166-175).

All convs are BasicConv2d: conv (no bias) + BN(eps=1e-3, frozen) + relu.
Weights convert from a torchvision ``inception_v3`` state_dict via
``convert_inception_state_dict``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from munit_tpu.core import ops


def _avg_pool3_s1_p1(x):
    """torch avg_pool2d(3, 1, 1) with count_include_pad=True → sum/9."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


class BasicConv2d(nn.Module):
    out: int
    kernel: tuple    # (kh, kw)
    stride: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        ph, pw = self.padding
        k = self.param("kernel", nn.initializers.kaiming_normal(),
                       (kh, kw, x.shape[-1], self.out))
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        x = jax.lax.conv_general_dilated(
            x, k, (self.stride, self.stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.out)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.out)).value
        x = ops.batch_norm_inference(x, mean, var, scale, bias, eps=1e-3)
        return jax.nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avg_pool3_s1_p1(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = ops.max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3_s1_p1(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = ops.max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3_s1_p1(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns (pool 2048-d, logits 1000-d)."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = ops.max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = ops.max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        pool = jnp.mean(x, axis=(1, 2))
        kw = self.param("fc_kernel", nn.initializers.kaiming_normal(),
                        (2048, self.num_classes))
        kb = self.param("fc_bias", nn.initializers.zeros, (self.num_classes,))
        return pool, pool @ kw + kb


def inception_preprocess(img_pm1: jax.Array) -> jax.Array:
    """WrapInception preprocessing (inception_utils.py:40-46): [-1,1] →
    ImageNet norm → bilinear 299² with align_corners=True."""
    x = (img_pm1 + 1.0) * 0.5
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (x - mean) / std
    if x.shape[1] != 299 or x.shape[2] != 299:
        x = ops.resize_bilinear(x, (299, 299), align_corners=True)
    return x


def convert_inception_state_dict(sd) -> dict:
    """torchvision inception_v3 state_dict → {params, batch_stats}."""
    params: dict = {}
    stats: dict = {}

    def put(prefix_t, scope_path):
        p_node, s_node = params, stats
        for part in scope_path[:-1]:
            p_node = p_node.setdefault(part, {})
            s_node = s_node.setdefault(part, {})
        leaf = scope_path[-1]
        p_node[leaf] = {
            "kernel": np.transpose(sd[f"{prefix_t}.conv.weight"], (2, 3, 1, 0)),
            "bn_scale": sd[f"{prefix_t}.bn.weight"],
            "bn_bias": sd[f"{prefix_t}.bn.bias"],
        }
        s_node[leaf] = {
            "mean": sd[f"{prefix_t}.bn.running_mean"],
            "var": sd[f"{prefix_t}.bn.running_var"],
        }

    stem = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
            "Conv2d_3b_1x1", "Conv2d_4a_3x3"]
    for name in stem:
        put(name, [name])

    blocks: dict = {
        "Mixed_5b": ["branch1x1", "branch5x5_1", "branch5x5_2",
                     "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                     "branch_pool"],
        "Mixed_6a": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                     "branch3x3dbl_3"],
        "Mixed_6b": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                     "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                     "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
        "Mixed_7a": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                     "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"],
        "Mixed_7b": ["branch1x1", "branch3x3_1", "branch3x3_2a",
                     "branch3x3_2b", "branch3x3dbl_1", "branch3x3dbl_2",
                     "branch3x3dbl_3a", "branch3x3dbl_3b", "branch_pool"],
    }
    blocks["Mixed_5c"] = blocks["Mixed_5d"] = blocks["Mixed_5b"]
    blocks["Mixed_6c"] = blocks["Mixed_6d"] = blocks["Mixed_6e"] = blocks["Mixed_6b"]
    blocks["Mixed_7c"] = blocks["Mixed_7b"]
    for mixed, branches in blocks.items():
        for br in branches:
            put(f"{mixed}.{br}", [mixed, br])

    params["fc_kernel"] = np.transpose(sd["fc.weight"], (1, 0))
    params["fc_bias"] = sd["fc.bias"]
    return {"params": params, "batch_stats": stats}
