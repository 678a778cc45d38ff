"""Independent torch re-implementation of the reference MUNIT architecture.

Test fixture ONLY. Written from the structural description in SURVEY.md §2/§3
(not copied from /root/reference) in torch 2.x style, but producing
*identical state_dict key layout and math* as the reference networks so it can
serve as (a) a golden forward model for pixel-parity tests and (b) a source of
reference-format ``.pt`` checkpoints for testing the converter
(munit_tpu.io.torch_import).

Key layout notes (what the converter must understand):
- Conv blocks appear as ``<prefix>.model.<i>.conv.{weight,bias}``.
- AdaIN layers contribute dummy buffers ``...norm.running_{mean,var}``.
- Decoder LN convs add ``...norm.{gamma,beta}``.
- The style encoder's final 1x1 conv and each discriminator CNN's last layer
  are bare ``nn.Conv2d`` → ``...<i>.{weight,bias}``.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class _AdaIN(nn.Module):
    """Externally-parameterized instance norm; params set by the generator."""

    def __init__(self, num_features: int, eps: float = 1e-5):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.weight = None  # std / gamma
        self.bias = None    # mean / beta
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))

    def forward(self, x):
        b, c, h, w = x.shape
        flat = x.reshape(1, b * c, h, w)
        out = F.batch_norm(
            flat, self.running_mean.repeat(b), self.running_var.repeat(b),
            self.weight, self.bias, True, 0.1, self.eps)
        return out.reshape(b, c, h, w)


class _WholeLN(nn.Module):
    """Per-sample whole-tensor LayerNorm with unbiased std and eps-on-std."""

    def __init__(self, num_features: int, eps: float = 1e-5):
        super().__init__()
        self.eps = eps
        self.gamma = nn.Parameter(torch.rand(num_features))
        self.beta = nn.Parameter(torch.zeros(num_features))

    def forward(self, x):
        b = x.size(0)
        mean = x.reshape(b, -1).mean(1).reshape(b, 1, 1, 1)
        std = x.reshape(b, -1).std(1).reshape(b, 1, 1, 1)
        x = (x - mean) / (std + self.eps)
        return x * self.gamma.reshape(1, -1, 1, 1) + self.beta.reshape(1, -1, 1, 1)


_PADS = {"reflect": nn.ReflectionPad2d, "replicate": nn.ReplicationPad2d,
         "zero": nn.ZeroPad2d}
_ACTS = {"relu": nn.ReLU, "lrelu": lambda: nn.LeakyReLU(0.2),
         "tanh": nn.Tanh, "none": None}


class _ConvBlock(nn.Module):
    def __init__(self, cin, cout, k, s, p, norm="none", act="relu",
                 pad_type="zero"):
        super().__init__()
        self.pad = _PADS[pad_type](p)
        self.conv = nn.Conv2d(cin, cout, k, s, bias=True)
        self.norm = {"in": lambda: nn.InstanceNorm2d(cout),
                     "ln": lambda: _WholeLN(cout),
                     "adain": lambda: _AdaIN(cout),
                     "none": lambda: None}[norm]()
        self.activation = _ACTS[act]() if _ACTS[act] else None

    def forward(self, x):
        x = self.conv(self.pad(x))
        if self.norm is not None:
            x = self.norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class _Seq(nn.Module):
    """Container exposing children under the attribute name ``model``."""

    def __init__(self, *mods):
        super().__init__()
        self.model = nn.Sequential(*mods)

    def forward(self, x):
        return self.model(x)


class _ResBlock(_Seq):
    def __init__(self, dim, norm, act, pad_type):
        super().__init__(
            _ConvBlock(dim, dim, 3, 1, 1, norm, act, pad_type),
            _ConvBlock(dim, dim, 3, 1, 1, norm, "none", pad_type))

    def forward(self, x):
        return x + self.model(x)


def _res_blocks(n, dim, norm, act, pad_type):
    return _Seq(*[_ResBlock(dim, norm, act, pad_type) for _ in range(n)])


def make_style_encoder(n_down, cin, dim, style_dim, act, pad_type):
    mods = [_ConvBlock(cin, dim, 7, 1, 3, "none", act, pad_type)]
    for _ in range(2):
        mods.append(_ConvBlock(dim, 2 * dim, 4, 2, 1, "none", act, pad_type))
        dim *= 2
    for _ in range(n_down - 2):
        mods.append(_ConvBlock(dim, dim, 4, 2, 1, "none", act, pad_type))
    mods += [nn.AdaptiveAvgPool2d(1), nn.Conv2d(dim, style_dim, 1, 1, 0)]
    return _Seq(*mods)


def make_content_encoder(n_down, n_res, cin, dim, act, pad_type):
    mods = [_ConvBlock(cin, dim, 7, 1, 3, "in", act, pad_type)]
    for _ in range(n_down):
        mods.append(_ConvBlock(dim, 2 * dim, 4, 2, 1, "in", act, pad_type))
        dim *= 2
    mods.append(_res_blocks(n_res, dim, "in", act, pad_type))
    enc = _Seq(*mods)
    enc.output_dim = dim
    return enc


def make_decoder(n_up, n_res, dim, cout, act, pad_type):
    mods = [_res_blocks(n_res, dim, "adain", act, pad_type)]
    for _ in range(n_up):
        mods += [nn.Upsample(scale_factor=2),
                 _ConvBlock(dim, dim // 2, 5, 1, 2, "ln", act, pad_type)]
        dim //= 2
    mods.append(_ConvBlock(dim, cout, 7, 1, 3, "none", "tanh", pad_type))
    return _Seq(*mods)


def make_mlp(cin, cout, dim, n_blk, act):
    class _Lin(nn.Module):
        def __init__(self, i, o, a):
            super().__init__()
            self.fc = nn.Linear(i, o, bias=True)
            self.activation = _ACTS[a]() if _ACTS[a] else None

        def forward(self, x):
            x = self.fc(x)
            return self.activation(x) if self.activation else x

    mods = [_Lin(cin, dim, act)]
    for _ in range(n_blk - 2):
        mods.append(_Lin(dim, dim, act))
    mods.append(_Lin(dim, cout, "none"))
    seq = _Seq(*mods)
    fwd = seq.forward
    seq.forward = lambda x: fwd(x.reshape(x.size(0), -1))
    return seq


def _adain_layers(module):
    return [m for m in module.modules() if isinstance(m, _AdaIN)]


def _assign_adain(params, module):
    for m in _adain_layers(module):
        c = m.num_features
        m.bias = params[:, :c].contiguous().reshape(-1)
        m.weight = params[:, c:2 * c].contiguous().reshape(-1)
        params = params[:, 2 * c:] if params.size(1) > 2 * c else params


def num_adain_params(module):
    return sum(2 * m.num_features for m in _adain_layers(module))


class MirrorAdaINGen(nn.Module):
    """gen_state=0 single-domain auto-encoder."""

    def __init__(self, cin, p):
        super().__init__()
        self.enc_style = make_style_encoder(
            4, cin, p["dim"], p["style_dim"], p["activ"], p["pad_type"])
        self.enc_content = make_content_encoder(
            p["n_downsample"], p["n_res"], cin, p["dim"], p["activ"],
            p["pad_type"])
        self.dec = make_decoder(
            p["n_downsample"], p["n_res"], self.enc_content.output_dim, cin,
            p["activ"], p["pad_type"])
        self.mlp = make_mlp(p["style_dim"], num_adain_params(self.dec),
                            p["mlp_dim"], 3, p["activ"])

    def encode(self, x):
        return self.enc_content(x), self.enc_style(x)

    def decode(self, content, style):
        _assign_adain(self.mlp(style), self.dec)
        return self.dec(content)


class MirrorAdaINGenDouble(nn.Module):
    """gen_state=1: shared style encoder, dual content/decoder/mlp."""

    def __init__(self, cin, p):
        super().__init__()
        self.enc_style = make_style_encoder(
            4, cin, p["dim"], p["style_dim"], p["activ"], p["pad_type"])
        self.enc1_content = make_content_encoder(
            p["n_downsample"], p["n_res"], cin, p["dim"], p["activ"],
            p["pad_type"])
        self.enc2_content = make_content_encoder(
            p["n_downsample"], p["n_res"], cin, p["dim"], p["activ"],
            p["pad_type"])
        cdim = self.enc1_content.output_dim
        self.dec1 = make_decoder(p["n_downsample"], p["n_res"], cdim, cin,
                                 p["activ"], p["pad_type"])
        self.dec2 = make_decoder(p["n_downsample"], p["n_res"], cdim, cin,
                                 p["activ"], p["pad_type"])
        nad = num_adain_params(self.dec1)
        self.mlp1 = make_mlp(p["style_dim"], nad, p["mlp_dim"], 3, p["activ"])
        self.mlp2 = make_mlp(p["style_dim"], nad, p["mlp_dim"], 3, p["activ"])

    def encode(self, x, domain):
        enc = self.enc1_content if domain == 1 else self.enc2_content
        return enc(x), self.enc_style(x)

    def decode(self, content, style, domain):
        dec = self.dec1 if domain == 1 else self.dec2
        mlp = self.mlp1 if domain == 1 else self.mlp2
        _assign_adain(mlp(style), dec)
        return dec(content)


class MirrorMsImageDis(nn.Module):
    def __init__(self, cin, p):
        super().__init__()
        self.downsample = nn.AvgPool2d(3, stride=2, padding=1,
                                       count_include_pad=False)
        self.cnns = nn.ModuleList()
        for _ in range(p["num_scales"]):
            dim = p["dim"]
            mods = [_ConvBlock(cin, dim, 4, 2, 1, "none", p["activ"],
                               p["pad_type"])]
            for _ in range(p["n_layer"] - 1):
                mods.append(_ConvBlock(dim, 2 * dim, 4, 2, 1, p["norm"],
                                       p["activ"], p["pad_type"]))
                dim *= 2
            mods.append(nn.Conv2d(dim, 1, 1, 1, 0))
            self.cnns.append(nn.Sequential(*mods))

    def forward(self, x):
        outs = []
        for cnn in self.cnns:
            outs.append(cnn(x))
            x = self.downsample(x)
        return outs


GEN_PARAMS = dict(dim=64, mlp_dim=256, style_dim=16, activ="relu",
                  n_downsample=2, n_res=4, pad_type="reflect")
DIS_PARAMS = dict(dim=64, norm="none", activ="lrelu", n_layer=4,
                  gan_type="lsgan", num_scales=3, pad_type="reflect")


def small_gen_params():
    return dict(GEN_PARAMS, dim=16, mlp_dim=32, style_dim=8, n_res=2)


def small_dis_params():
    return dict(DIS_PARAMS, dim=16, n_layer=3, num_scales=2)
