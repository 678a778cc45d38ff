"""Production inference service for the flood-translation model.

The reference's "production" path is a batch script (test.py). This module
provides the serving runtime the write-up's public flood simulator implies:
a persistent process that loads the generator once, pre-encodes the style
exemplar, keeps the jitted translate function warm, and answers image →
flooded-image requests over HTTP (stdlib http.server — zero extra deps).

  python -m munit_tpu.serve.server --config configs/config_256.yaml \\
      --checkpoint gen.pt --style style.png --port 8787

API:
  GET  /healthz             → {"status": "ok", "device": ...}
  POST /translate           → JPEG bytes (body: image file bytes)
  POST /translate?style=ID  → use a named preloaded style
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


class TranslationService:
    """Owns the generator params, style codes, and the jitted step."""

    def __init__(self, conf: Dict, gen_params, new_size: Optional[int] = None):
        from munit_tpu.train import GenBundle
        self.conf = conf
        self.gen = GenBundle(conf)
        self.params = gen_params
        self.new_size = new_size or conf["new_size"]
        self.styles: Dict[str, jax.Array] = {}
        self._lock = threading.Lock()

        def _translate(x_a, s_b):
            c_a, _ = self.gen.encode(self.params, x_a, 1)
            return self.gen.decode(self.params, c_a, s_b, 2)

        self._translate = jax.jit(_translate)
        self._encode_style = jax.jit(
            lambda x: self.gen.encode(self.params, x, 2)[1])

    def _prep(self, img: Image.Image) -> jax.Array:
        from munit_tpu.data import transforms as T
        img = T.resize_shorter(img.convert("RGB"), self.new_size)
        w, h = img.size
        s = self.new_size
        img = T.crop(img, (h - s) // 2, (w - s) // 2, s, s)
        return jnp.asarray(T.normalize_pm1(T.to_array01(img)))[None]

    def add_style(self, name: str, exemplar: Image.Image):
        self.styles[name] = self._encode_style(self._prep(exemplar))

    def warmup(self):
        if self.styles:
            x = jnp.zeros((1, self.new_size, self.new_size, 3))
            _ = self._translate(x, next(iter(self.styles.values())))

    def translate(self, img: Image.Image, style: str = "default") -> Image.Image:
        if style not in self.styles:
            raise KeyError(f"unknown style '{style}'")
        with self._lock:  # single-accelerator; serialize device access
            out = self._translate(self._prep(img), self.styles[style])
        arr = np.asarray((out[0] + 1.0) * 0.5)
        lo, hi = arr.min(), arr.max()
        arr = (arr - lo) / max(hi - lo, 1e-5)
        return Image.fromarray((arr * 255).round().astype(np.uint8))


def _make_handler(service: TranslationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path.startswith("/healthz"):
                body = json.dumps({
                    "status": "ok",
                    "device": str(jax.devices()[0]),
                    "styles": sorted(service.styles),
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if not self.path.startswith("/translate"):
                self.send_response(404)
                self.end_headers()
                return
            style = "default"
            if "style=" in self.path:
                style = self.path.split("style=")[1].split("&")[0]
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            try:
                img = Image.open(io.BytesIO(data))
                out = service.translate(img, style)
            except Exception as e:  # noqa: BLE001
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            buf = io.BytesIO()
            out.save(buf, format="JPEG", quality=92)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve(service: TranslationService, port: int = 8787,
          host: str = "127.0.0.1") -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), _make_handler(service))
    return server


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--style", required=True, help="style exemplar image")
    p.add_argument("--port", type=int, default=8787)
    opts = p.parse_args(argv)

    from munit_tpu.cli.translate import load_gen_params
    from munit_tpu.config import get_config
    conf = get_config(opts.config)
    svc = TranslationService(conf, load_gen_params(opts.checkpoint, conf))
    svc.add_style("default", Image.open(opts.style))
    svc.warmup()
    server = serve(svc, opts.port)
    print(f"serving on :{opts.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
