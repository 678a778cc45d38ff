"""AOT deployment artifacts (io/aot.py): export → load → serve without
model code. The reference's production path re-builds the whole trainer to
serve (test.py:55-73); the artifact replaces that with serialized StableHLO
(weights baked in, symbolic batch dim)."""

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
import yaml

from munit_tpu.config import validate
from munit_tpu.io import aot
from munit_tpu.serve import TranslationService
from munit_tpu.train import GenBundle

from tests import torch_mirror as tm


def _tiny_conf():
    return validate({
        "gen_state": 1, "guided": 1, "new_size": 32,
        "crop_image_height": 32, "crop_image_width": 32,
        "gen": dict(tm.small_gen_params()),
        "dis": dict(tm.small_dis_params()),
    })


def _init_params(conf):
    gen = GenBundle(conf)

    def touch(mdl, x):
        c1, s = mdl.encode(x, 1)
        c2, _ = mdl.encode(x, 2)
        return mdl.decode(c1, s, 1), mdl.decode(c2, s, 2)

    params = gen.module.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)),
                             method=touch)["params"]
    return gen, params


def test_aot_roundtrip_parity(tmp_path):
    conf = _tiny_conf()
    gen, params = _init_params(conf)
    path = str(tmp_path / "model.jexp.zip")
    aot.save_artifact(path, gen, params, 32, conf["gen"]["style_dim"],
                      platforms=("cpu",), conv_dtype="float32")
    t = aot.load_artifact(path)
    assert t.new_size == 32

    rng = np.random.RandomState(0)
    style = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32) * 0.3
    x = jnp.asarray(rng.randn(3, 32, 32, 3), jnp.float32) * 0.3

    s = t.encode_style(style)
    y = t.translate(x, s)          # batch-1 style broadcasts to batch-3 x

    c, _ = gen.encode(params, x, 1)
    _, s_ref = gen.encode(params, style, 2)
    y_ref = gen.decode(params, c,
                       jnp.broadcast_to(s_ref, (3,) + s_ref.shape[1:]), 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=0)

    # symbolic batch: a different batch size hits the same exported program
    y1 = t.translate(x[:1], s)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y_ref[:1]),
                               atol=1e-5, rtol=0)


def test_aot_cli_export_and_artifact_serving(tmp_path):
    """checkpoint_tools export-aot on a packed .npz, then TranslationService
    in artifact mode (no config/params) matches the model-backed service."""
    conf = _tiny_conf()
    gen, params = _init_params(conf)

    from munit_tpu.io.checkpoint import save_inference_params
    npz = str(tmp_path / "gen.npz")
    save_inference_params(npz, params, quant="bf16")

    cfg_path = str(tmp_path / "conf.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({
            "gen_state": 1, "guided": 1, "new_size": 32,
            "crop_image_height": 32, "crop_image_width": 32,
            "gen": dict(tm.small_gen_params()),
            "dis": dict(tm.small_dis_params()),
        }, f)

    art = str(tmp_path / "model.jexp.zip")
    from munit_tpu.cli.checkpoint_tools import main as ck_main
    ck_main(["export-aot", "--config", cfg_path, "--ckpt", npz,
             "--out", art, "--platforms", "cpu", "--dtype", "f32"])

    # model-backed control service on the SAME packed weights
    from munit_tpu.cli.translate import load_gen_params
    svc_ref = TranslationService(conf, load_gen_params(npz, conf), mesh="off")
    svc = TranslationService(artifact=art, mesh="off")
    assert svc.new_size == 32

    rng = np.random.RandomState(3)
    style = Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8))
    svc_ref.add_style("default", style)
    svc.add_style("default", style)
    svc.warmup()

    img = Image.fromarray(rng.randint(0, 255, (48, 52, 3), np.uint8))
    got = np.asarray(svc.translate(img), np.int16)
    want = np.asarray(svc_ref.translate(img), np.int16)
    assert np.abs(got - want).max() <= 1


def test_aot_artifact_mesh_serving(tmp_path):
    """Artifact mode composes with data-parallel serving: the exported call
    jits with batch shardings on the fake 8-device mesh and matches the
    single-device artifact service."""
    conf = _tiny_conf()
    gen, params = _init_params(conf)
    path = str(tmp_path / "model.jexp.zip")
    aot.save_artifact(path, gen, params, 32, conf["gen"]["style_dim"],
                      platforms=("cpu",), conv_dtype="float32")

    svc1 = TranslationService(artifact=path, mesh="off")
    svcm = TranslationService(artifact=path, mesh="auto", max_batch=8)
    assert svcm.n_dev == 8

    rng = np.random.RandomState(5)
    style = Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8))
    for svc in (svc1, svcm):
        svc.add_style("default", style)
    img = Image.fromarray(rng.randint(0, 255, (48, 52, 3), np.uint8))
    got = np.asarray(svcm.translate(img), np.int16)
    want = np.asarray(svc1.translate(img), np.int16)
    assert np.abs(got - want).max() <= 1


def test_aot_artifact_rejects_quant(tmp_path):
    conf = _tiny_conf()
    gen, params = _init_params(conf)
    path = str(tmp_path / "model.jexp.zip")
    aot.save_artifact(path, gen, params, 32, conf["gen"]["style_dim"],
                      platforms=("cpu",), conv_dtype="float32")
    import pytest
    with pytest.raises(ValueError):
        TranslationService(artifact=path, quant="int8")


def test_aot_int8_static_quant_baked(tmp_path):
    """quant_scales bakes calibrated-static W8A8 convs into the exported
    translate program: the artifact matches the directly-quantized body and
    demonstrably differs from the unquantized one (quant_all bypasses the
    shape heuristic so tiny test channels quantize at all)."""
    from munit_tpu.core import ops

    conf = _tiny_conf()
    gen, params = _init_params(conf)
    rng = np.random.RandomState(7)
    style = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32) * 0.3
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32) * 0.3
    _, s1 = gen.encode(params, style, 2)
    s = jnp.broadcast_to(s1, (2,) + s1.shape[1:])

    def body(x_a, s_b):
        c, _ = gen.encode(params, x_a, 1)
        return gen.decode(params, c, s_b, 2)

    @jax.jit
    def record(x_a, s_b):
        rec = []
        with ops.conv_quant(record=rec, all_convs=True):
            out = body(x_a, s_b)
        return out, jnp.stack(rec)

    _, mx = record(x, s)
    scales = [1.1 * float(v) for v in np.asarray(mx)]
    assert scales   # all_convs: every generator conv is a site

    path = str(tmp_path / "model_int8.jexp.zip")
    aot.save_artifact(path, gen, params, 32, conf["gen"]["style_dim"],
                      platforms=("cpu",), conv_dtype="float32",
                      quant_scales=scales, quant_all=True)
    t = aot.load_artifact(path)
    assert t.meta["quant"] == "int8-static"

    got = np.asarray(t.translate(x, s1))

    @jax.jit
    def direct(x_a, s_b):
        with ops.conv_quant(scales=scales, all_convs=True):
            return body(x_a, s_b)

    want = np.asarray(direct(x, s))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)
    # quantization is actually engaged: differs from the f32 program
    assert np.abs(got - np.asarray(jax.jit(body)(x, s))).max() > 1e-4


def test_aot_artifact_rejects_new_size_mismatch(tmp_path):
    """H/W are static in the export (only batch is symbolic): a new_size
    override must be rejected at construction, not as an aval mismatch at
    the first dispatch."""
    import pytest

    conf = _tiny_conf()
    gen, params = _init_params(conf)
    path = str(tmp_path / "model.jexp.zip")
    aot.save_artifact(path, gen, params, 32, conf["gen"]["style_dim"],
                      platforms=("cpu",), conv_dtype="float32")
    with pytest.raises(ValueError, match="exported at 32px"):
        TranslationService(artifact=path, new_size=64, mesh="off")
