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
        # AvgPool2d((16,16)) then squeeze → (B, 64)
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 16, 16, 1), (1, 16, 16, 1),
            [(0, 0)] * 4) / 256.0
        x = x.reshape(x.shape[0], -1)
        k = self.param("fc_kernel", init.gaussian, (x.shape[-1], 1))
        b = self.param("fc_bias", init.zeros, (1,))
        return x @ k + b
