from munit_tpu.nn.blocks import ConvBlock, LinearBlock, ResBlock, ResBlocks, MLP  # noqa: F401
from munit_tpu.nn.generator import (  # noqa: F401
    StyleEncoder, ContentEncoder, Decoder, AdaINGen, AdaINGenDual, VAEGen,
)
from munit_tpu.nn.discriminator import MsImageDis  # noqa: F401
