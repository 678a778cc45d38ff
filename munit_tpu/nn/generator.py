"""MUNIT generators, TPU-native.

Architectures mirror /root/reference/scripts/networks.py but are functional:
the style MLP's output is split into per-layer (gamma, beta) pairs and passed
DOWN the decoder call, replacing the reference's in-place module mutation
(networks.py:223-239 ``assign_adain_params``).

Layout: NHWC. Style codes are (B, style_dim) vectors (the reference carries
(B, style_dim, 1, 1)).

AdaIN parameter layout matches the reference consumption order
(networks.py:230-239): traversing decoder res-blocks in order, each AdaIN layer
takes ``[beta(C), gamma(C)]`` (the reference calls them mean/std) from the
front of the MLP output.
"""

from __future__ import annotations

from typing import Callable, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from munit_tpu.core import ops, init
from munit_tpu.nn.blocks import AdainPair, ConvBlock, MLP, ResBlocks


class StyleEncoder(nn.Module):
    """networks.py:442-477. 7x7 s1 → 2 doubling 4x4 s2 → (n_downsample-2)
    non-doubling 4x4 s2 → GAP → 1x1 conv → (B, style_dim)."""

    n_downsample: int
    dim: int
    style_dim: int
    activ: str = "relu"
    pad_type: str = "reflect"
    kernel_init: Callable = init.kaiming_normal

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = self.dim
        x = ConvBlock(dim, 7, 1, 3, norm="none", activ=self.activ,
                      pad_type=self.pad_type, kernel_init=self.kernel_init,
                      name="layer_0")(x)
        li = 1
        for _ in range(2):
            x = ConvBlock(2 * dim, 4, 2, 1, norm="none", activ=self.activ,
                          pad_type=self.pad_type, kernel_init=self.kernel_init,
                          name=f"layer_{li}")(x)
            dim *= 2
            li += 1
        for _ in range(self.n_downsample - 2):
            x = ConvBlock(dim, 4, 2, 1, norm="none", activ=self.activ,
                          pad_type=self.pad_type, kernel_init=self.kernel_init,
                          name=f"layer_{li}")(x)
            li += 1
        x = ops.global_avg_pool(x)
        x = ConvBlock(self.style_dim, 1, 1, 0, norm="none", activ="none",
                      pad_type="zero", kernel_init=self.kernel_init,
                      name="out_conv")(x)
        return x.reshape(x.shape[0], self.style_dim)


class ContentEncoder(nn.Module):
    """networks.py:480-512. 7x7 s1 IN → n_downsample doubling 4x4 s2 IN →
    n_res IN res blocks. Output (B, H/2^n, W/2^n, dim*2^n)."""

    n_downsample: int
    n_res: int
    dim: int
    norm: str = "in"
    activ: str = "relu"
    pad_type: str = "reflect"
    kernel_init: Callable = init.kaiming_normal

    @property
    def output_dim(self) -> int:
        return self.dim * (2 ** self.n_downsample)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = self.dim
        x = ConvBlock(dim, 7, 1, 3, norm=self.norm, activ=self.activ,
                      pad_type=self.pad_type, kernel_init=self.kernel_init,
                      name="layer_0")(x)
        for i in range(self.n_downsample):
            x = ConvBlock(2 * dim, 4, 2, 1, norm=self.norm, activ=self.activ,
                          pad_type=self.pad_type, kernel_init=self.kernel_init,
                          name=f"layer_{i + 1}")(x)
            dim *= 2
        x = ResBlocks(self.n_res, dim, norm=self.norm, activ=self.activ,
                      pad_type=self.pad_type, kernel_init=self.kernel_init,
                      name="res")(x)
        return x


class Decoder(nn.Module):
    """networks.py:515-563. n_res AdaIN res blocks → n_upsample ×
    [2x nearest upsample, 5x5 conv + custom-LN + act] → 7x7 conv + tanh."""

    n_upsample: int
    n_res: int
    dim: int           # content dim entering the decoder
    output_dim: int    # image channels
    res_norm: str = "adain"
    activ: str = "relu"
    pad_type: str = "reflect"
    kernel_init: Callable = init.kaiming_normal

    @property
    def num_adain_params(self) -> int:
        # 2 convs per res block, 2*dim params per AdaIN layer
        return self.n_res * 2 * 2 * self.dim if self.res_norm == "adain" else 0

    def split_adain_params(self, adain_params: jax.Array) -> List[AdainPair]:
        """Split the MLP output (B, num_adain) into per-layer (gamma, beta).

        Consumption order matches networks.py:230-239: per AdaIN layer, the
        first ``dim`` entries are the shift (reference "mean"/bias) and the
        next ``dim`` the scale (reference "std"/weight).
        """
        pairs: List[AdainPair] = []
        off = 0
        for _ in range(self.n_res * 2):
            beta = adain_params[:, off:off + self.dim]
            gamma = adain_params[:, off + self.dim:off + 2 * self.dim]
            pairs.append((gamma, beta))
            off += 2 * self.dim
        return pairs

    @nn.compact
    def __call__(self, x: jax.Array, adain_params: jax.Array | None = None) -> jax.Array:
        pairs = (self.split_adain_params(adain_params)
                 if self.res_norm == "adain" else None)
        dim = self.dim
        x = ResBlocks(self.n_res, dim, norm=self.res_norm, activ=self.activ,
                      pad_type=self.pad_type, kernel_init=self.kernel_init,
                      name="res")(x, pairs)
        # Cross-layer LN×s2d fusion (opt-in MUNIT_LN_S2D=1): the last
        # up-conv's whole-tensor LN is permutation-invariant, so its stats
        # can be computed over a space-to-depth view and its normalize+act
        # applied INSIDE the s2d out-conv's input processing — removing the
        # {3,0,2,1}-layout-pinned full-tensor reduce (BENCH.md r2). Exact up
        # to f32 summation order.
        import os as _os
        h_out = x.shape[1] * (2 ** self.n_upsample)
        f_out = ops.s2d_rescue_factor(h_out, x.shape[2] * (2 ** self.n_upsample),
                                      7, dim // (2 ** self.n_upsample),
                                      self.output_dim, 1, 3)
        fuse_tail = (_os.environ.get("MUNIT_LN_S2D", "0") == "1"
                     and self.n_upsample > 0 and f_out > 1
                     and self.activ in ("relu", "lrelu", "selu", "none"))
        # Lane-packed tail (core/packed_tail.py): keep the last up stage +
        # out conv in s2d f=2 space — lane-full [.,H,W,4*64] instead of the
        # half-lane [.,2H,2W,64], no full-res materialization. Exact (border
        # rings recomputed by strip convs). MUNIT_PACKED_TAIL: 1=on,
        # auto=on for production-sized outputs (>=256 px), 0=off. Measured
        # 2.4x on the HD tail chain (tools/hdtailprobe.py) and +12.5% on the
        # full 256^2 training step (101.6 -> 114.4 img/s, BENCH.md r3);
        # below 256 px the border-strip overhead eats the interior win, so
        # tiny test shapes keep the reference-faithful path.
        from munit_tpu.core import packed_tail as _pt
        _pt_mode = _os.environ.get("MUNIT_PACKED_TAIL", "auto")
        h_last = x.shape[1] * (2 ** max(self.n_upsample - 1, 0))
        w_last = x.shape[2] * (2 ** max(self.n_upsample - 1, 0))
        use_packed = (self.n_upsample > 0 and self.pad_type == "reflect"
                      and (_pt_mode == "1"
                           or (_pt_mode == "auto" and 2 * h_last >= 256))
                      and _pt.supported(h_last, w_last))
        from jax.ad_checkpoint import checkpoint_name
        for i in range(self.n_upsample):
            last = i == self.n_upsample - 1
            if use_packed and last:
                up = ConvBlock(dim // 2, 5, 1, 2, norm="ln", activ=self.activ,
                               pad_type=self.pad_type,
                               kernel_init=self.kernel_init, name=f"up_{i}")
                k5, b5, g, b = up(x, raw_params=True)
                oc = ConvBlock(self.output_dim, 7, 1, 3, norm="none",
                               activ="tanh", pad_type=self.pad_type,
                               kernel_init=self.kernel_init, name="out_conv")
                k7, b7 = oc(x[:, :1, :1, :dim // 2], raw_params=True)
                out = _pt.packed_decoder_tail(x, k5, b5, g, b, k7, b7,
                                              activ=self.activ)
                return ops.activation("tanh")(out)
            # Non-last up stages: the same phase-collapse packed (one 3x3
            # conv with 4x out channels — 36% of the MACs, no upsampled-
            # input materialization — LN+act packed, then unpack since the
            # next consumer needs pixel space). Exact; −10% on the up_0
            # chain under grad (tools/upconvprobe2.py).
            if (use_packed and not last
                    and _os.environ.get("MUNIT_PACKED_UP", "1") == "1"
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                    and x.shape[1] >= 8 and x.shape[2] >= 8):
                up = ConvBlock(dim // 2, 5, 1, 2, norm="ln",
                               activ=self.activ, pad_type=self.pad_type,
                               kernel_init=self.kernel_init, name=f"up_{i}")
                k5, b5, g, b = up(x, raw_params=True)
                x = checkpoint_name(
                    _pt.packed_up_block(x, k5, b5, g, b, activ=self.activ),
                    "dec_up_act")
                dim //= 2
                continue
            # "dec_up_in": the nearest-upsampled conv input is the largest
            # decoder buffer held for the conv kernel-grad; under the "hd"
            # remat policy it is recomputed in the backward (recompute ≈ a
            # gather) instead of stored — the HD 512² batch-8 enabler.
            # Inert tag without an enclosing jax.checkpoint.
            x = checkpoint_name(ops.upsample_nearest(x, 2), "dec_up_in")
            up = ConvBlock(dim // 2, 5, 1, 2, norm="ln", activ=self.activ,
                           pad_type=self.pad_type,
                           kernel_init=self.kernel_init, name=f"up_{i}")
            last = i == self.n_upsample - 1
            if fuse_tail and last:
                y, g, b = up(x, raw_ln=True)
                mean, std_eps = ops.whole_ln_stats_s2d(y, f_out)
                gs = jnp.tile(g.astype(jnp.float32), f_out * f_out)
                bs = jnp.tile(b.astype(jnp.float32), f_out * f_out)
                act = ops.activation(self.activ)

                def pre(xs):
                    xn = (xs.astype(jnp.float32) - mean) / std_eps * gs + bs
                    return act(xn).astype(xs.dtype)

                return ConvBlock(self.output_dim, 7, 1, 3, norm="none",
                                 activ="tanh", pad_type=self.pad_type,
                                 kernel_init=self.kernel_init,
                                 name="out_conv")(y, pre_s2d=pre)
            x = checkpoint_name(up(x), "dec_up_act")
            dim //= 2
        x = ConvBlock(self.output_dim, 7, 1, 3, norm="none", activ="tanh",
                      pad_type=self.pad_type, kernel_init=self.kernel_init,
                      name="out_conv")(x)
        return x


class AdaINGen(nn.Module):
    """Single-domain MUNIT auto-encoder (gen_state=0; networks.py:170-254)."""

    input_dim: int
    dim: int
    style_dim: int
    n_downsample: int
    n_res: int
    mlp_dim: int
    activ: str = "relu"
    pad_type: str = "reflect"
    kernel_init: Callable = init.kaiming_normal

    def setup(self):
        self.enc_style = StyleEncoder(
            4, self.dim, self.style_dim, self.activ, self.pad_type,
            self.kernel_init)
        self.enc_content = ContentEncoder(
            self.n_downsample, self.n_res, self.dim, "in", self.activ,
            self.pad_type, self.kernel_init)
        content_dim = self.dim * (2 ** self.n_downsample)
        self.dec = Decoder(
            self.n_downsample, self.n_res, content_dim, self.input_dim,
            "adain", self.activ, self.pad_type, self.kernel_init)
        self.mlp = MLP(self.dec.num_adain_params, self.mlp_dim, 3, self.activ,
                       self.kernel_init)

    def encode(self, images: jax.Array):
        return self.enc_content(images), self.enc_style(images)

    def decode(self, content: jax.Array, style: jax.Array) -> jax.Array:
        return self.dec(content, self.mlp(style))

    def get_adain_params(self, style: jax.Array) -> jax.Array:
        return self.mlp(style)

    def __call__(self, images: jax.Array) -> jax.Array:
        content, style = self.encode(images)
        return self.decode(content, style)


class AdaINGenDual(nn.Module):
    """The fork's default generator (gen_state=1; networks.py:262-388):
    ONE shared style encoder, per-domain content encoders / decoders / MLPs.
    ``domain`` is a static Python int in {1, 2}."""

    input_dim: int
    dim: int
    style_dim: int
    n_downsample: int
    n_res: int
    mlp_dim: int
    activ: str = "relu"
    pad_type: str = "reflect"
    kernel_init: Callable = init.kaiming_normal

    def setup(self):
        mk_enc = lambda: ContentEncoder(
            self.n_downsample, self.n_res, self.dim, "in", self.activ,
            self.pad_type, self.kernel_init)
        content_dim = self.dim * (2 ** self.n_downsample)
        mk_dec = lambda: Decoder(
            self.n_downsample, self.n_res, content_dim, self.input_dim,
            "adain", self.activ, self.pad_type, self.kernel_init)
        self.enc_style = StyleEncoder(
            4, self.dim, self.style_dim, self.activ, self.pad_type,
            self.kernel_init)
        self.enc1_content = mk_enc()
        self.enc2_content = mk_enc()
        self.dec1 = mk_dec()
        self.dec2 = mk_dec()
        num_adain = self.dec1.num_adain_params
        self.mlp1 = MLP(num_adain, self.mlp_dim, 3, self.activ, self.kernel_init)
        self.mlp2 = MLP(num_adain, self.mlp_dim, 3, self.activ, self.kernel_init)

    def encode(self, images: jax.Array, domain: int):
        style = self.enc_style(images)
        content = (self.enc1_content if domain == 1 else self.enc2_content)(images)
        return content, style

    def decode(self, content: jax.Array, style: jax.Array, domain: int) -> jax.Array:
        if domain == 1:
            return self.dec1(content, self.mlp1(style))
        return self.dec2(content, self.mlp2(style))

    def get_adain_params(self, style: jax.Array, domain: int) -> jax.Array:
        return (self.mlp1 if domain == 1 else self.mlp2)(style)

    def __call__(self, images: jax.Array, domain: int = 1) -> jax.Array:
        content, style = self.encode(images, domain)
        return self.decode(content, style, domain)


class VAEGen(nn.Module):
    """UNIT-style VAE generator (networks.py:391-434). Unused by the reference
    entry points but part of the model zoo for parity."""

    input_dim: int
    dim: int
    n_downsample: int
    n_res: int
    activ: str = "relu"
    pad_type: str = "reflect"
    kernel_init: Callable = init.kaiming_normal

    def setup(self):
        self.enc = ContentEncoder(
            self.n_downsample, self.n_res, self.dim, "in", self.activ,
            self.pad_type, self.kernel_init)
        content_dim = self.dim * (2 ** self.n_downsample)
        self.dec = Decoder(
            self.n_downsample, self.n_res, content_dim, self.input_dim,
            "in", self.activ, self.pad_type, self.kernel_init)

    def encode(self, images: jax.Array, rng: jax.Array):
        hiddens = self.enc(images)
        noise = jax.random.normal(rng, hiddens.shape, hiddens.dtype)
        return hiddens, noise

    def decode(self, hiddens: jax.Array) -> jax.Array:
        return self.dec(hiddens)

    def __call__(self, images: jax.Array, rng: jax.Array,
                 training: bool = True):
        hiddens, noise = self.encode(images, rng)
        return self.decode(hiddens + noise if training else hiddens), hiddens
