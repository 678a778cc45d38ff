"""Serving runtime: service + HTTP round trip with a tiny model."""

import io
import threading
import urllib.request

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from munit_tpu.config import validate
from munit_tpu.serve import TranslationService, serve
from munit_tpu.train import GenBundle

from tests import torch_mirror as tm


def make_service():
    conf = validate({
        "gen_state": 1, "guided": 1, "new_size": 32,
        "crop_image_height": 32, "crop_image_width": 32,
        "gen": dict(tm.small_gen_params()),
        "dis": dict(tm.small_dis_params()),
    })
    gen = GenBundle(conf)

    def touch(mdl, x):
        c1, s = mdl.encode(x, 1)
        c2, _ = mdl.encode(x, 2)
        return mdl.decode(c1, s, 1), mdl.decode(c2, s, 2)

    params = gen.module.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)), method=touch)["params"]
    svc = TranslationService(conf, params)
    rng = np.random.RandomState(0)
    svc.add_style("default",
                  Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)))
    svc.warmup()
    return svc


def test_service_translate_direct():
    svc = make_service()
    rng = np.random.RandomState(1)
    out = svc.translate(
        Image.fromarray(rng.randint(0, 255, (48, 52, 3), np.uint8)))
    assert out.size == (32, 32)


def test_http_round_trip():
    svc = make_service()
    server = serve(svc, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert b"ok" in r.read()

        rng = np.random.RandomState(2)
        buf = io.BytesIO()
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
            buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/translate", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            img = Image.open(io.BytesIO(r.read()))
            assert img.size == (32, 32)

        # unknown style → 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/translate?style=nope",
            data=buf.getvalue(), method="POST")
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
