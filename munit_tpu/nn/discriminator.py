"""Multi-scale PatchGAN discriminator (networks.py:20-162), TPU-native.

``num_scales`` identical CNNs; the input is AvgPool(3, s2, p1,
count_include_pad=False)-downsampled between scales. Each CNN:
4x4 s2 conv (no norm) → (n_layer-1) doubling 4x4 s2 convs → 1x1 conv → logit
map. Returns the list of per-scale logit maps (B, h_i, w_i, 1).

Loss assembly (LSGAN / NSGAN / the sim-real 0.5-target variants) lives in
``munit_tpu.losses`` as pure functions over these outputs.
"""

from __future__ import annotations

from typing import Callable, List

import jax
import flax.linen as nn

from munit_tpu.core import ops, init
from munit_tpu.nn.blocks import ConvBlock


class _DisCNN(nn.Module):
    n_layer: int
    dim: int
    norm: str
    activ: str
    pad_type: str
    kernel_init: Callable

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = self.dim
        x = ConvBlock(dim, 4, 2, 1, norm="none", activ=self.activ,
                      pad_type=self.pad_type, kernel_init=self.kernel_init,
                      name="layer_0")(x)
        for i in range(self.n_layer - 1):
            x = ConvBlock(dim * 2, 4, 2, 1, norm=self.norm, activ=self.activ,
                          pad_type=self.pad_type, kernel_init=self.kernel_init,
                          name=f"layer_{i + 1}")(x)
            dim *= 2
        return ConvBlock(1, 1, 1, 0, norm="none", activ="none",
                         pad_type="zero", kernel_init=self.kernel_init,
                         name="out_conv")(x)


class MsImageDis(nn.Module):
    input_dim: int
    n_layer: int = 4
    dim: int = 64
    norm: str = "none"
    activ: str = "lrelu"
    num_scales: int = 3
    pad_type: str = "reflect"
    gan_type: str = "lsgan"
    kernel_init: Callable = init.gaussian

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        outputs = []
        for s in range(self.num_scales):
            outputs.append(_DisCNN(self.n_layer, self.dim, self.norm,
                                   self.activ, self.pad_type, self.kernel_init,
                                   name=f"cnn_{s}")(x))
            if s + 1 < self.num_scales:
                x = ops.avg_pool_3x3_s2(x)
        return outputs
