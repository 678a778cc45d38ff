"""AOT deployment artifacts via ``jax.export`` (serialized StableHLO).

The reference's production inference path re-builds the full Python model
just to serve (test.py:55-73 constructs the whole ``MUNIT_Trainer`` — frozen
segmenter included — only to use ``trainer.gen``). The TPU-native deployment
story is the opposite: trace + lower the guided-translation functions ONCE,
serialize the lowered programs with the weights baked in, and serve from a
process that needs neither the model code nor the config — only ``jax``.

Artifact format — a single zip file (suffix ``.jexp.zip`` by convention):

  meta.json           {"format": 1, "new_size", "style_dim", "platforms",
                       "conv_dtype", "created_by"}
  encode_style.jexp   jax.export serialization: style image (branch 2)
                      → style code
  translate.jexp      jax.export serialization: content encode (branch 1)
                      + guided decode (branch 2), i.e. test.py:117-120
                      semantics, generator params as baked-in constants

Both programs are exported with a SYMBOLIC batch dimension, so one artifact
serves every batch size — the serving micro-batcher's power-of-two buckets
all hit the same exported program (no per-bucket retrace; the runtime still
compiles per concrete shape, exactly like jit). Exported for both "cpu" and
"tpu" by default: the same file deploys to a TPU server and replays in CPU
CI. Height/width stay static (they are static in the jit path too — the
packed decoder tail and the s2d stem rescues do spatial shape arithmetic).
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

FORMAT = 1


def _export_fn(fn, args, platforms: Sequence[str]):
    return jexport.export(jax.jit(fn), platforms=list(platforms))(*args)


def export_translator(gen, params, image_size: int,
                      platforms: Sequence[str] = ("cpu", "tpu"),
                      quant_scales: Optional[Sequence[float]] = None,
                      quant_all: bool = False):
    """Export (encode_style, translate) with a symbolic batch dim.

    ``gen`` is a GenBundle; ``params`` its parameter pytree. Returns
    {"encode_style": Exported, "translate": Exported}. The style-code
    shape is whatever ``gen.encode(..., 2)[1]`` produces — ``translate``
    takes it positionally, so callers never need to know it.

    ``quant_scales``: per-site activation maxima from a calibration pass
    (``core.ops.conv_quant(record=...)`` over the same translate body) —
    bakes calibrated-static W8A8 int8 convs into the exported translate
    program (encode_style stays full precision; it runs once per style).
    ``quant_all`` bypasses the shape heuristic (tests/A-B only).
    """
    (b,) = jexport.symbolic_shape("b")
    img = jax.ShapeDtypeStruct((b, image_size, image_size, 3), jnp.float32)

    def encode_style(style_img):
        return gen.encode(params, style_img, 2)[1]

    enc = _export_fn(encode_style, (img,), platforms)
    # translate's style arg shares the content batch's symbolic dim — the
    # loader broadcasts a batch-1 exemplar code up to the request batch
    s_spec = jax.ShapeDtypeStruct(enc.out_avals[0].shape,
                                  enc.out_avals[0].dtype)

    def body(x_a, s_b):
        c_a, _ = gen.encode(params, x_a, 1)
        return gen.decode(params, c_a, s_b, 2)

    def translate(x_a, s_b):
        if quant_scales is not None:
            from munit_tpu.core import ops
            with ops.conv_quant(scales=quant_scales, all_convs=quant_all):
                return body(x_a, s_b)
        return body(x_a, s_b)

    tr = _export_fn(translate, (img, s_spec), platforms)
    return {"encode_style": enc, "translate": tr}


def save_artifact(path: str, gen, params, image_size: int, style_dim: int,
                  platforms: Sequence[str] = ("cpu", "tpu"),
                  conv_dtype: str = "bfloat16",
                  quant_scales: Optional[Sequence[float]] = None,
                  quant_all: bool = False) -> None:
    """Export and write the deployment artifact zip to ``path``.

    ``conv_dtype`` is recorded metadata only — the caller configures
    ``ops.set_conv_compute`` BEFORE calling (the traced programs bake it in).
    """
    ex = export_translator(gen, params, image_size, platforms,
                           quant_scales=quant_scales, quant_all=quant_all)
    meta = {
        "format": FORMAT,
        "new_size": image_size,
        "style_dim": style_dim,
        "platforms": list(platforms),
        "conv_dtype": conv_dtype,
        "quant": "int8-static" if quant_scales is not None else "none",
        "created_by": "munit_tpu",
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("encode_style.jexp",
                   bytes(ex["encode_style"].serialize()))
        z.writestr("translate.jexp", bytes(ex["translate"].serialize()))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


class Translator:
    """A loaded deployment artifact: guided translation without model code.

    ``encode_style(img [b,S,S,3] in [-1,1]) -> style code``
    ``translate(x [b,S,S,3], s) -> [b,S,S,3] in [-1,1]``

    Both accept any batch size (symbolic-batch export). ``translate``
    broadcasts a batch-1 style code to the content batch — the serving
    pattern (one pre-encoded exemplar, many requests).
    """

    def __init__(self, meta: Dict, encode_style_exp, translate_exp):
        self.meta = meta
        self.new_size = meta["new_size"]
        # raw exported entry points — jittable with custom shardings (the
        # serving layer wraps them for data-parallel dispatch)
        self.encode_style_call = encode_style_exp.call
        self.translate_call = translate_exp.call
        self._encode = jax.jit(self.encode_style_call)
        self._translate = jax.jit(self.translate_call)

    def encode_style(self, style_img):
        return self._encode(jnp.asarray(style_img, jnp.float32))

    def translate(self, x, s):
        x = jnp.asarray(x, jnp.float32)
        if s.shape[0] == 1 and x.shape[0] != 1:
            s = jnp.broadcast_to(s, (x.shape[0],) + s.shape[1:])
        return self._translate(x, s)


def load_artifact(path: str) -> Translator:
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("format") != FORMAT:
            raise ValueError(f"unsupported artifact format {meta.get('format')}"
                             f" (this build reads format {FORMAT})")
        enc = jexport.deserialize(bytearray(z.read("encode_style.jexp")))
        tr = jexport.deserialize(bytearray(z.read("translate.jexp")))
    return Translator(meta, enc, tr)
