"""Flax building blocks mirroring the reference's basic layers.

Reference semantics (cited into /root/reference/scripts):
- ConvBlock  ≙ Conv2dBlock (networks.py:627-701): pad → conv(bias) → norm → act.
- LinearBlock (networks.py:704-749): linear(bias) → norm → act.
- ResBlock   (networks.py:603-624): two 3x3 conv blocks, identity add, second
  conv has no activation.
- MLP        (networks.py:583-597): n_blk LinearBlocks, linear output.

Departures from the reference (TPU-first): NHWC layout; AdaIN is functional —
per-layer (gamma, beta) are passed down the call instead of being assigned onto
module state (replaces networks.py:230-239); norms compute statistics in f32.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from munit_tpu.core import ops, init

AdainPair = Tuple[jax.Array, jax.Array]  # (gamma (B,C), beta (B,C))


def _act(module: "nn.Module", name: str, x: jax.Array) -> jax.Array:
    """Apply activation; 'prelu' owns a learned scalar like torch nn.PReLU()."""
    if name == "prelu":
        alpha = module.param("prelu_alpha", lambda k, s: jnp.full(s, 0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x)
    return ops.activation(name)(x)


class ConvBlock(nn.Module):
    """pad → conv → norm → activation (Conv2dBlock, networks.py:627-701)."""

    out_dim: int
    kernel_size: int
    stride: int
    padding: int = 0
    norm: str = "none"          # none | in | ln | adain | bn | sn
    activ: str = "relu"
    pad_type: str = "zero"
    kernel_init: Callable = init.kaiming_normal

    @nn.compact
    def __call__(self, x: jax.Array,
                 adain_params: Optional[AdainPair] = None,
                 update_sn: bool = False,
                 raw_ln: bool = False,
                 pre_s2d=None,
                 raw_params: bool = False) -> jax.Array:
        """``raw_ln``: norm=='ln' only — skip norm+act and return
        (conv_out, ln_gamma, ln_beta) so a consumer can apply the LN fused
        into its own input processing (Decoder LN×s2d fusion).
        ``pre_s2d``: elementwise fn applied to the space-to-depth slab
        before the conv on the s2d-rescued path (see ops.conv2d_s2d).
        ``raw_params``: define and return this block's parameters without
        computing anything — x is a shape donor only. Returns
        (kernel, bias) or (kernel, bias, ln_gamma, ln_beta) for norm=='ln'.
        Lets a consumer run the math in a rearranged form (the lane-packed
        decoder tail) while keeping the checkpoint param tree identical."""
        in_dim = x.shape[-1]
        kshape = (self.kernel_size, self.kernel_size, in_dim, self.out_dim)
        kernel = self.param("kernel", self.kernel_init, kshape)
        bias = self.param("bias", init.zeros, (self.out_dim,))

        if raw_params:
            if self.norm == "ln":
                gamma = self.param("ln_gamma", init.uniform01, (self.out_dim,))
                beta = self.param("ln_beta", init.zeros, (self.out_dim,))
                return kernel, bias, gamma, beta
            return kernel, bias

        if self.norm == "sn":
            # Spectral norm: one power iteration per call on the (out, fan_in)
            # matricized kernel (networks.py:885-942). u/v live in the
            # 'spectral' collection; the reference updates them every forward.
            h = self.out_dim
            w = self.kernel_size * self.kernel_size * in_dim
            u = self.variable("spectral", "u",
                              lambda: jax.random.normal(self.make_rng("params"), (h,)))
            v = self.variable("spectral", "v",
                              lambda: jax.random.normal(self.make_rng("params"), (w,)))
            wmat = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(h, w)
            l2n = lambda t: t / (jnp.linalg.norm(t) + 1e-12)
            v_new = l2n(wmat.T @ u.value)
            u_new = l2n(wmat @ v_new)
            if update_sn and not self.is_initializing():
                u.value, v.value = u_new, v_new
            sigma = u_new @ (wmat @ v_new)
            kernel = kernel / sigma
            # The reference's sn path drops the padding arg (networks.py:684-689)
            x = ops.conv2d(x, kernel, bias, self.stride)
        else:
            f = ops.s2d_rescue_factor(x.shape[1], x.shape[2],
                                      self.kernel_size, in_dim, self.out_dim,
                                      self.stride, self.padding)
            if f:
                # small-channel conv on a space-to-depth grid (exact; see
                # ops.conv2d_s2d) — rescues the MXU-starved stem/output 7x7s.
                # Instance-norm stats and elementwise activations are
                # spatially permutation-invariant, so they run on the PACKED
                # slab (full f²·cout lane occupancy vs the half-lane unpacked
                # stem slab; +13% on the stem chain under grad,
                # tools/stemprobe2.py) with the unpack moved after — exact.
                post = None
                if (pre_s2d is None and self.activ != "prelu"
                        and self.norm in ("in", "none")
                        and os.environ.get("MUNIT_PACKED_STEM", "1") == "1"):
                    act = ops.activation(self.activ)
                    if self.norm == "in":
                        fr = self.activ == "relu"
                        cout = self.out_dim

                        def post(y2, _f=f, _fr=fr, _c=cout, _act=act):
                            z = ops.packed_instance_norm(y2, _f, _c, relu=_fr)
                            return z if _fr else _act(z)
                    elif self.activ != "none":
                        post = act
                if post is not None:
                    return ops.conv2d_s2d(x, kernel, bias, f=f,
                                          pad=self.padding,
                                          pad_type=self.pad_type, post=post)
                x = ops.conv2d_s2d(x, kernel, bias, f=f, pad=self.padding,
                                   pad_type=self.pad_type, pre=pre_s2d)
            else:
                if pre_s2d is not None:
                    raise ValueError("pre_s2d requires the s2d conv path")
                x = ops.pad2d(x, self.padding, self.pad_type)
                x = ops.conv2d(x, kernel, bias, self.stride)

        # norm (+ fused relu where the Pallas path applies)
        fuse_relu = self.activ == "relu"
        if self.norm == "in":
            from munit_tpu.kernels.norms import maybe_instance_norm
            x = maybe_instance_norm(x, relu=fuse_relu)
            if fuse_relu:
                return x
        elif self.norm == "ln":
            gamma = self.param("ln_gamma", init.uniform01, (self.out_dim,))
            beta = self.param("ln_beta", init.zeros, (self.out_dim,))
            if raw_ln:
                return x, gamma, beta
            x = ops.whole_layer_norm(x, gamma, beta)
        elif self.norm == "adain":
            assert adain_params is not None, "AdaIN ConvBlock needs (gamma, beta)"
            from munit_tpu.kernels.norms import maybe_adain
            x = maybe_adain(x, adain_params[0], adain_params[1],
                            relu=fuse_relu)
            if fuse_relu:
                return x
        elif self.norm == "bn":
            # Train-mode batch norm is not used by any shipped config; the only
            # BN consumers are frozen pretrained nets which use
            # ops.batch_norm_inference with converted running stats.
            mean = self.variable("batch_stats", "mean",
                                 lambda: jnp.zeros(self.out_dim))
            var = self.variable("batch_stats", "var",
                                lambda: jnp.ones(self.out_dim))
            gamma = self.param("bn_gamma", lambda k, s: jnp.ones(s), (self.out_dim,))
            beta = self.param("bn_beta", init.zeros, (self.out_dim,))
            x = ops.batch_norm_inference(x, mean.value, var.value, gamma, beta)
        elif self.norm not in ("none", "sn"):
            raise ValueError(f"Unsupported normalization: {self.norm}")

        return _act(self, self.activ, x)


class LinearBlock(nn.Module):
    """linear → norm → activation (networks.py:704-749)."""

    out_dim: int
    norm: str = "none"
    activ: str = "relu"
    kernel_init: Callable = init.kaiming_normal

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.out_dim))
        bias = self.param("bias", init.zeros, (self.out_dim,))
        x = x @ kernel + bias
        if self.norm == "ln":
            gamma = self.param("ln_gamma", init.uniform01, (self.out_dim,))
            beta = self.param("ln_beta", init.zeros, (self.out_dim,))
            mean = jnp.mean(x, axis=-1, keepdims=True)
            n = x.shape[-1]
            std = jnp.std(x, axis=-1, keepdims=True) * jnp.sqrt(n / (n - 1))
            x = (x - mean) / (std + 1e-5) * gamma + beta
        elif self.norm not in ("none",):
            raise ValueError(f"Unsupported normalization: {self.norm}")
        return _act(self, self.activ, x)


class ResBlock(nn.Module):
    """Two 3x3 conv blocks + identity (networks.py:603-624)."""

    dim: int
    norm: str = "in"
    activ: str = "relu"
    pad_type: str = "zero"
    kernel_init: Callable = init.kaiming_normal

    @nn.compact
    def __call__(self, x: jax.Array,
                 adain_params: Optional[Sequence[AdainPair]] = None) -> jax.Array:
        p0 = adain_params[0] if adain_params is not None else None
        p1 = adain_params[1] if adain_params is not None else None
        y = ConvBlock(self.dim, 3, 1, 1, norm=self.norm, activ=self.activ,
                      pad_type=self.pad_type, kernel_init=self.kernel_init,
                      name="conv_0")(x, p0)
        y = ConvBlock(self.dim, 3, 1, 1, norm=self.norm, activ="none",
                      pad_type=self.pad_type, kernel_init=self.kernel_init,
                      name="conv_1")(y, p1)
        return x + y


class ResBlocks(nn.Module):
    """Stack of ResBlocks (networks.py:569-580)."""

    num_blocks: int
    dim: int
    norm: str = "in"
    activ: str = "relu"
    pad_type: str = "zero"
    kernel_init: Callable = init.kaiming_normal

    @nn.compact
    def __call__(self, x: jax.Array,
                 adain_params: Optional[Sequence[AdainPair]] = None) -> jax.Array:
        for i in range(self.num_blocks):
            per_block = (adain_params[2 * i: 2 * i + 2]
                         if adain_params is not None else None)
            x = ResBlock(self.dim, self.norm, self.activ, self.pad_type,
                         self.kernel_init, name=f"block_{i}")(x, per_block)
        return x


class MLP(nn.Module):
    """Style → AdaIN-parameter MLP (networks.py:583-597): input flattened,
    n_blk linear blocks, linear output."""

    out_dim: int
    dim: int
    n_blk: int = 3
    activ: str = "relu"
    kernel_init: Callable = init.kaiming_normal

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.reshape(x.shape[0], -1)
        x = LinearBlock(self.dim, activ=self.activ,
                        kernel_init=self.kernel_init, name="fc_0")(x)
        for i in range(self.n_blk - 2):
            x = LinearBlock(self.dim, activ=self.activ,
                            kernel_init=self.kernel_init, name=f"fc_{i + 1}")(x)
        return LinearBlock(self.out_dim, activ="none",
                           kernel_init=self.kernel_init,
                           name=f"fc_{self.n_blk - 1}")(x)
