"""Domain classifiers on content codes (utils.py:1370-1392 + 1220-1276).

``DomainClassifier``: content code (B,64,64,256) NHWC →
MaxPool(2) → BasicBlock(256→128) → MaxPool(2) → BasicBlock(128→64) →
AvgPool(16) → FC(64→1) scalar logit.

The reference's BasicBlock here (utils.py:1220-1276) is the torchvision-style
block with train-mode BatchNorm2d; downsample branch (1x1 conv + BN) is active
because in/out channels differ. Train-mode BN uses batch statistics — flax
nn.BatchNorm with use_running_average=False reproduces that (running stats are
tracked in 'batch_stats' for eval).
"""

from __future__ import annotations

import jax
import flax.linen as nn

from munit_tpu.core import ops, init


class _ClsBasicBlock(nn.Module):
    planes: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name)
        k1 = self.param("conv1", init.gaussian, (3, 3, x.shape[-1], self.planes))
        out = ops.conv2d(ops.pad2d(x, 1, "zero"), k1)
        out = jax.nn.relu(bn("bn1")(out))
        k2 = self.param("conv2", init.gaussian, (3, 3, self.planes, self.planes))
        out = bn("bn2")(ops.conv2d(ops.pad2d(out, 1, "zero"), k2))
        kd = self.param("down_conv", init.gaussian, (1, 1, x.shape[-1], self.planes))
        identity = bn("down_bn")(ops.conv2d(x, kd))
        return jax.nn.relu(out + identity)


class DomainClassifier(nn.Module):
    """Scalar domain logit from a content code (utils.py:1370-1392)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ops.max_pool(x, 2, 2)
        x = _ClsBasicBlock(128, name="block1")(x, train)
        x = ops.max_pool(x, 2, 2)
        x = _ClsBasicBlock(64, name="block2")(x, train)
        # AvgPool2d((16,16)) then squeeze → (B, 64). At the reference's only
        # operating point (256² images → 64² content) the window is exactly
        # the 16² map. For smaller debug shapes (where torch AvgPool2d(16)
        # would error out / produce zero windows) clamp the window to the
        # available extent so gradients stay live.
        wh = min(16, x.shape[1])
        ww = min(16, x.shape[2])
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, wh, ww, 1), (1, wh, ww, 1),
            [(0, 0)] * 4) / float(wh * ww)
        x = x.reshape(x.shape[0], -1)
        k = self.param("fc_kernel", init.gaussian, (x.shape[-1], 1))
        b = self.param("fc_bias", init.zeros, (1,))
        return x @ k + b


def convert_domain_classifier_state_dict(sd):
    """torch ``domainClassifier`` state_dict (utils.py:1370-1392) → flax
    variables {params, batch_stats} for ``DomainClassifier``.

    Torch keys: BasicBlock{1,2}.{conv1,conv2}.weight (OIHW, bias-less),
    .bn{1,2}.{weight,bias,running_mean,running_var},
    .downsample.{0.weight, 1.*}, fc.{weight,bias}.
    """
    import numpy as np

    conv = lambda k: np.transpose(np.asarray(sd[k]), (2, 3, 1, 0))
    vec = lambda k: np.asarray(sd[k])

    def bn(prefix):
        return ({"scale": vec(f"{prefix}.weight"),
                 "bias": vec(f"{prefix}.bias")},
                {"mean": vec(f"{prefix}.running_mean"),
                 "var": vec(f"{prefix}.running_var")})

    def block(p):
        bn1_p, bn1_s = bn(f"{p}.bn1")
        bn2_p, bn2_s = bn(f"{p}.bn2")
        dbn_p, dbn_s = bn(f"{p}.downsample.1")
        params = {"conv1": conv(f"{p}.conv1.weight"),
                  "conv2": conv(f"{p}.conv2.weight"),
                  "down_conv": conv(f"{p}.downsample.0.weight"),
                  "bn1": bn1_p, "bn2": bn2_p, "down_bn": dbn_p}
        stats = {"bn1": bn1_s, "bn2": bn2_s, "down_bn": dbn_s}
        return params, stats

    b1_p, b1_s = block("BasicBlock1")
    b2_p, b2_s = block("BasicBlock2")
    params = {"block1": b1_p, "block2": b2_p,
              "fc_kernel": np.asarray(sd["fc.weight"]).T,
              "fc_bias": vec("fc.bias")}
    return {"params": params, "batch_stats": {"block1": b1_s, "block2": b2_s}}
