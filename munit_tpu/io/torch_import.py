"""PyTorch reference-checkpoint → munit_tpu param-pytree converter.

Understands the reference's state_dict layouts (trainer.py:1387-1429):
- ``gen_%08d.pt``: {"2": dual-gen state_dict} (gen_state=1) or
  {"a": ..., "b": ...} (gen_state=0), key layout per networks.py.
- ``dis_%08d.pt``: {"a": ..., "b": ...} MsImageDis state_dicts.

Transforms applied:
- conv weights OIHW → HWIO; linear weights (out,in) → (in,out);
- AdaIN dummy running-stat buffers dropped (networks.py:820-821);
- custom-LayerNorm gamma/beta → ln_gamma/ln_beta.

Structure mapping (torch key → flax path), derived from the Sequential layouts
in networks.py (cited in each helper below).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


Array = np.ndarray
StateDict = Dict[str, Array]


def _conv(sd: StateDict, tkey: str) -> dict:
    """Bare nn.Conv2d / Conv2dBlock.conv → ConvBlock params."""
    out = {
        "kernel": np.transpose(sd[f"{tkey}.weight"], (2, 3, 1, 0)),
        "bias": sd[f"{tkey}.bias"],
    }
    return out


def _conv_block(sd: StateDict, tkey: str) -> dict:
    """Conv2dBlock (networks.py:627-701): .conv + optional .norm (ln only)."""
    out = _conv(sd, f"{tkey}.conv")
    if f"{tkey}.norm.gamma" in sd:
        out["ln_gamma"] = sd[f"{tkey}.norm.gamma"]
        out["ln_beta"] = sd[f"{tkey}.norm.beta"]
    return out


def _linear_block(sd: StateDict, tkey: str) -> dict:
    return {
        "kernel": np.transpose(sd[f"{tkey}.fc.weight"], (1, 0)),
        "bias": sd[f"{tkey}.fc.bias"],
    }


def _style_encoder(sd: StateDict, prefix: str, n_downsample: int = 4) -> dict:
    """StyleEncoder (networks.py:442-477): model.0..(n_conv-1) conv blocks,
    model.{n_conv} pool (paramless), model.{n_conv+1} bare 1x1 conv."""
    n_conv = 1 + 2 + (n_downsample - 2)
    out = {f"layer_{i}": _conv_block(sd, f"{prefix}.model.{i}")
           for i in range(n_conv)}
    out["out_conv"] = _conv(sd, f"{prefix}.model.{n_conv + 1}")
    return out


def _res_blocks(sd: StateDict, prefix: str, n_res: int) -> dict:
    """ResBlocks (networks.py:569-580): model.{j}.model.{c} conv blocks."""
    return {
        f"block_{j}": {
            f"conv_{c}": _conv_block(sd, f"{prefix}.model.{j}.model.{c}")
            for c in range(2)}
        for j in range(n_res)}


def _content_encoder(sd: StateDict, prefix: str, n_downsample: int,
                     n_res: int) -> dict:
    """ContentEncoder (networks.py:480-512): model.0..n_down conv blocks,
    model.{n_down+1} ResBlocks."""
    out = {f"layer_{i}": _conv_block(sd, f"{prefix}.model.{i}")
           for i in range(n_downsample + 1)}
    out["res"] = _res_blocks(sd, f"{prefix}.model.{n_downsample + 1}", n_res)
    return out


def _decoder(sd: StateDict, prefix: str, n_upsample: int, n_res: int) -> dict:
    """Decoder (networks.py:515-563): model.0 ResBlocks, then per upsample
    [Upsample (paramless), ConvBlock] at 2i+1 / 2i+2, final ConvBlock."""
    out = {"res": _res_blocks(sd, f"{prefix}.model.0", n_res)}
    for i in range(n_upsample):
        out[f"up_{i}"] = _conv_block(sd, f"{prefix}.model.{2 * i + 2}")
    out["out_conv"] = _conv_block(sd, f"{prefix}.model.{2 * n_upsample + 1}")
    return out


def _mlp(sd: StateDict, prefix: str, n_blk: int = 3) -> dict:
    """MLP (networks.py:583-597): model.{i}.fc linear blocks."""
    return {f"fc_{i}": _linear_block(sd, f"{prefix}.model.{i}")
            for i in range(n_blk)}


def convert_gen_state_dict(sd: StateDict, gen_conf: dict,
                           dual: bool = True) -> dict:
    """Convert an AdaINGen / AdaINGen_double state_dict to flax params."""
    nd, nr = gen_conf["n_downsample"], gen_conf["n_res"]
    if dual:
        return {
            "enc_style": _style_encoder(sd, "enc_style"),
            "enc1_content": _content_encoder(sd, "enc1_content", nd, nr),
            "enc2_content": _content_encoder(sd, "enc2_content", nd, nr),
            "dec1": _decoder(sd, "dec1", nd, nr),
            "dec2": _decoder(sd, "dec2", nd, nr),
            "mlp1": _mlp(sd, "mlp1"),
            "mlp2": _mlp(sd, "mlp2"),
        }
    return {
        "enc_style": _style_encoder(sd, "enc_style"),
        "enc_content": _content_encoder(sd, "enc_content", nd, nr),
        "dec": _decoder(sd, "dec", nd, nr),
        "mlp": _mlp(sd, "mlp"),
    }


def convert_vae_gen_state_dict(sd: StateDict, gen_conf: dict) -> dict:
    """VAEGen (networks.py:391-434): enc = ContentEncoder, dec = Decoder with
    'in' res norm (no AdaIN buffers, no MLP)."""
    nd, nr = gen_conf["n_downsample"], gen_conf["n_res"]
    return {
        "enc": _content_encoder(sd, "enc", nd, nr),
        "dec": _decoder(sd, "dec", nd, nr),
    }


def strip_instance_norm_stats(sd: StateDict) -> StateDict:
    """pytorch03→04 migration (utils.py:1130-1216): drop InstanceNorm
    running-stat buffers from old checkpoints. The converter ignores unknown
    ``.norm.running_*`` keys anyway, so this is a no-op safeguard for strict
    consumers."""
    return {k: v for k, v in sd.items()
            if not k.endswith(("norm.running_mean", "norm.running_var"))}


def convert_dis_state_dict(sd: StateDict, dis_conf: dict) -> dict:
    """MsImageDis (networks.py:20-70): cnns.{s}.{i} conv blocks + bare last."""
    n_layer = dis_conf["n_layer"]
    out = {}
    for s in range(dis_conf["num_scales"]):
        cnn = {f"layer_{i}": _conv_block(sd, f"cnns.{s}.{i}")
               for i in range(n_layer)}
        cnn["out_conv"] = _conv(sd, f"cnns.{s}.{n_layer}")
        out[f"cnn_{s}"] = cnn
    return out


# ---------------------------------------------------------------------------
# Export (flax → reference torch state_dict) — lets reference users roundtrip
# ---------------------------------------------------------------------------


def _x_conv(params: dict, tkey: str, sd: StateDict, bare: bool = False):
    mid = "" if bare else ".conv"
    sd[f"{tkey}{mid}.weight"] = np.transpose(np.asarray(params["kernel"]),
                                             (3, 2, 0, 1))
    sd[f"{tkey}{mid}.bias"] = np.asarray(params["bias"])
    if "ln_gamma" in params:
        sd[f"{tkey}.norm.gamma"] = np.asarray(params["ln_gamma"])
        sd[f"{tkey}.norm.beta"] = np.asarray(params["ln_beta"])


def _x_adain_buffers(tkey: str, dim: int, sd: StateDict):
    sd[f"{tkey}.norm.running_mean"] = np.zeros(dim, np.float32)
    sd[f"{tkey}.norm.running_var"] = np.ones(dim, np.float32)


def _x_res(params: dict, prefix: str, sd: StateDict, adain: bool = False):
    for j, blk in sorted((int(k.split("_")[1]), v) for k, v in params.items()):
        for c in range(2):
            tkey = f"{prefix}.model.{j}.model.{c}"
            _x_conv(params[f"block_{j}"][f"conv_{c}"], tkey, sd)
            if adain:
                dim = params[f"block_{j}"][f"conv_{c}"]["kernel"].shape[-1]
                _x_adain_buffers(tkey, dim, sd)


def export_gen_state_dict(params: dict, gen_conf: dict,
                          dual: bool = True) -> StateDict:
    """Flax generator params → reference-format torch state_dict
    (inverse of convert_gen_state_dict; includes AdaIN dummy buffers)."""
    nd, nr = gen_conf["n_downsample"], gen_conf["n_res"]
    sd: StateDict = {}

    def style_enc(p, prefix):
        n_conv = 1 + 2 + (4 - 2)
        for i in range(n_conv):
            _x_conv(p[f"layer_{i}"], f"{prefix}.model.{i}", sd)
        _x_conv(p["out_conv"], f"{prefix}.model.{n_conv + 1}", sd, bare=True)

    def content_enc(p, prefix):
        for i in range(nd + 1):
            _x_conv(p[f"layer_{i}"], f"{prefix}.model.{i}", sd)
        _x_res(p["res"], f"{prefix}.model.{nd + 1}", sd)

    def decoder(p, prefix):
        _x_res(p["res"], f"{prefix}.model.0", sd, adain=True)
        for i in range(nd):
            _x_conv(p[f"up_{i}"], f"{prefix}.model.{2 * i + 2}", sd)
        _x_conv(p["out_conv"], f"{prefix}.model.{2 * nd + 1}", sd)

    def mlp(p, prefix):
        for i in range(3):
            sd[f"{prefix}.model.{i}.fc.weight"] = np.transpose(
                np.asarray(p[f"fc_{i}"]["kernel"]), (1, 0))
            sd[f"{prefix}.model.{i}.fc.bias"] = np.asarray(p[f"fc_{i}"]["bias"])

    if dual:
        style_enc(params["enc_style"], "enc_style")
        content_enc(params["enc1_content"], "enc1_content")
        content_enc(params["enc2_content"], "enc2_content")
        decoder(params["dec1"], "dec1")
        decoder(params["dec2"], "dec2")
        mlp(params["mlp1"], "mlp1")
        mlp(params["mlp2"], "mlp2")
    else:
        style_enc(params["enc_style"], "enc_style")
        content_enc(params["enc_content"], "enc_content")
        decoder(params["dec"], "dec")
        mlp(params["mlp"], "mlp")
    return sd


def export_dis_state_dict(params: dict, dis_conf: dict) -> StateDict:
    """MsImageDis flax params → reference cnns.{s}.{i} state_dict."""
    sd: StateDict = {}
    for s in range(dis_conf["num_scales"]):
        cnn = params[f"cnn_{s}"]
        for i in range(dis_conf["n_layer"]):
            _x_conv(cnn[f"layer_{i}"], f"cnns.{s}.{i}", sd)
        _x_conv(cnn["out_conv"], f"cnns.{s}.{dis_conf['n_layer']}", sd,
                bare=True)
    return sd


def save_reference_checkpoint(path: str, gen_params, gen_conf: dict,
                              gen_state: int = 1):
    """Write a reference-loadable gen_*.pt (trainer.py:1402-1407 layout)."""
    import torch
    if gen_state == 1:
        blob = {"2": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
                      export_gen_state_dict(gen_params, gen_conf, True).items()}}
    else:
        blob = {s: {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
                    export_gen_state_dict(gen_params[s], gen_conf,
                                          False).items()}
                for s in ("a", "b")}
    import torch as _t
    _t.save(blob, path)


def _to_numpy_state_dict(obj) -> StateDict:
    out = {}
    for k, v in obj.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, StateDict]:
    """Load a reference ``.pt`` checkpoint into {slot: numpy state_dict}.

    Slots follow trainer.py:1387-1429: "2" (dual gen), "a"/"b" (single gens or
    discriminators), "d" (domain classifier).
    """
    import torch  # local import: torch is only needed for checkpoint migration
    blob = torch.load(path, map_location="cpu", weights_only=True)
    return {slot: _to_numpy_state_dict(sd) for slot, sd in blob.items()}
