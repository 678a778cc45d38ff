"""Production inference service for the flood-translation model.

The reference's "production" path is a batch script (test.py). This module
provides the serving runtime the write-up's public flood simulator implies:
a persistent process that loads the generator once, pre-encodes the style
exemplar, keeps the jitted translate function warm, and answers image →
flooded-image requests over HTTP (stdlib http.server — zero extra deps).

  python -m munit_tpu.serve.server --config configs/config_256.yaml \\
      --checkpoint gen.pt --style style.png --port 8787

or, from an AOT deployment artifact (checkpoint_tools export-aot) — no
config, checkpoint, or model code needed at the destination (io/aot.py):

  python -m munit_tpu.serve.server --artifact model.jexp.zip \\
      --style style.png --port 8787

Concurrent requests are coalesced into one batched TPU dispatch by a
dynamic micro-batcher (``MicroBatcher``): up to --max-batch requests per
step, padded to power-of-two buckets so jit compiles a bounded shape set.

API:
  GET  /healthz             → {"status": "ok", "device": ...}
  GET  /stats               → micro-batcher counters (batch histogram, …)
  POST /translate           → JPEG bytes (body: image file bytes)
  POST /translate?style=ID  → use a named preloaded style
"""

from __future__ import annotations

import argparse
import io
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


class Overloaded(RuntimeError):
    """Request shed by the micro-batcher's admission control (HTTP 503)."""


class MicroBatcher:
    """Dynamic micro-batching for the translate dispatch.

    The TPU runs one program at a time; per-request dispatch leaves the
    MXU idle between HTTP arrivals and pays the full small-batch cost per
    image. This coalesces concurrent requests into one batched dispatch:
    the dispatcher thread drains up to ``max_batch`` queued requests
    (waiting at most ``max_wait_ms`` after the first arrival — under
    saturation the queue is never empty, so the wait never triggers and
    batches auto-scale to ``max_batch``), pads the batch up to a
    power-of-two bucket so jit compiles at most ``log2(max_batch)+1``
    shapes, runs ONE device step, and fans results back out.

    ``run_batch(x [B,H,W,3], s [B,...]) -> [B,H,W,3]`` must accept any
    bucket batch size (the jitted translate does — encode/decode are
    batch-polymorphic).
    """

    def __init__(self, run_batch, max_batch: int = 8,
                 max_wait_ms: float = 4.0, adaptive: bool = True,
                 min_batch: int = 1, max_queue: Optional[int] = None):
        self.run_batch = run_batch
        self.max_batch = max_batch
        # Admission control: beyond ~8 full dispatches of queued work the
        # device is saturated and every additional accepted request only
        # grows latency + host memory unboundedly — shed load instead
        # (HTTP 503 upstream).
        self.max_queue = max_queue if max_queue is not None \
            else 8 * max_batch
        self.min_batch = max(1, min_batch)  # mesh serving: multiple of n_dev
        self.max_wait = max_wait_ms / 1e3
        # Adaptive wait: coalescing-by-waiting only pays during a burst
        # (several requests in flight within ~one device step). Sparse
        # traffic queues nothing in the wait window, so waiting is pure
        # added latency; dense traffic queues during the PREVIOUS dispatch,
        # so waiting is unnecessary. Track an inter-arrival EWMA and wait
        # only while arrivals look bursty; a stale estimate (no arrival for
        # >1s) resets to dispatch-immediately.
        self.adaptive = adaptive
        self._gap: Optional[float] = None
        self._last_arrival: Optional[float] = None
        self.buckets = []
        b = self.min_batch
        while b < max_batch:
            self.buckets.append(b)
            b *= 2
        if not self.buckets or self.buckets[-1] != max_batch:
            self.buckets.append(max_batch)
        self._q: List[dict] = []
        self._cv = threading.Condition()
        self._closed = False
        self.stats = {"requests": 0, "batches": 0, "rejected": 0,
                      "batch_hist": {}, "device_ms": 0.0}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="munit-microbatcher")
        self._thread.start()

    def submit(self, x: np.ndarray, s) -> np.ndarray:
        """Block until the batched dispatch containing this request runs."""
        item = {"x": x, "s": s, "ev": threading.Event(),
                "out": None, "err": None}
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher closed")
            if len(self._q) >= self.max_queue:
                self.stats["rejected"] += 1
                raise Overloaded(
                    f"queue full ({self.max_queue} waiting requests)")
            now = time.monotonic()
            if self._last_arrival is not None:
                d = now - self._last_arrival
                if d < 1.0:
                    self._gap = d if self._gap is None \
                        else 0.8 * self._gap + 0.2 * d
                else:
                    self._gap = None  # idle era: stop predicting arrivals
            self._last_arrival = now
            self._q.append(item)
            self._cv.notify_all()
        item["ev"].wait()
        if item["err"] is not None:
            raise item["err"]
        return item["out"]

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    def stats_snapshot(self) -> dict:
        """Race-free copy for handlers (the dispatcher mutates batch_hist)."""
        with self._cv:
            st = dict(self.stats)
            st["batch_hist"] = dict(st["batch_hist"])
        return st

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.max_batch

    def _loop(self):
        while True:
            with self._cv:
                while not self._q and not self._closed:
                    self._cv.wait()
                if self._closed and not self._q:
                    return
                wait = self.max_wait
                if self.adaptive:
                    gap = self._gap
                    if gap is None:
                        wait = 0.0  # sparse traffic: no burst to wait for
                    else:
                        need = self.max_batch - len(self._q)
                        wait = min(self.max_wait, gap * max(need, 0) + gap)
                deadline = time.monotonic() + wait
                while (len(self._q) < self.max_batch and not self._closed):
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self._cv.wait(left)
                batch = self._q[:self.max_batch]
                del self._q[:len(batch)]
            if not batch:
                continue
            n = len(batch)
            b = self._bucket(n)
            try:
                x = np.concatenate([it["x"] for it in batch], axis=0)
                s = jnp.concatenate([it["s"] for it in batch], axis=0)
                if b > n:
                    x = np.concatenate(
                        [x, np.repeat(x[-1:], b - n, axis=0)], axis=0)
                    s = jnp.concatenate(
                        [s, jnp.repeat(s[-1:], b - n, axis=0)], axis=0)
                t0 = time.monotonic()
                y = np.asarray(self.run_batch(jnp.asarray(x), s))
                dt = (time.monotonic() - t0) * 1e3
                with self._cv:
                    self.stats["requests"] += n
                    self.stats["batches"] += 1
                    self.stats["batch_hist"][n] = \
                        self.stats["batch_hist"].get(n, 0) + 1
                    self.stats["device_ms"] += dt
                for i, it in enumerate(batch):
                    it["out"] = y[i:i + 1]
                    it["ev"].set()
            except Exception as e:  # noqa: BLE001 — fan the error out
                for it in batch:
                    it["err"] = e
                    it["ev"].set()


class TranslationService:
    """Owns the generator params, style codes, and the jitted step."""

    def __init__(self, conf: Optional[Dict] = None, gen_params=None,
                 new_size: Optional[int] = None,
                 max_batch: int = 1, max_wait_ms: float = 4.0,
                 quant: str = "none", mesh: str = "auto",
                 artifact: Optional[str] = None,
                 max_queue: Optional[int] = None):
        from munit_tpu.core import ops
        self.conf = conf
        self.artifact = None
        if artifact is not None:
            # AOT deployment artifact (io/aot.py): the lowered programs with
            # weights baked in — no model code, config, or checkpoint needed.
            if quant == "int8":
                raise ValueError("int8 is baked at export time for AOT "
                                 "artifacts; re-export instead of --quant")
            from munit_tpu.io import aot
            self.artifact = aot.load_artifact(artifact)
            self.gen = None
            self.params = None
            if new_size and new_size != self.artifact.new_size:
                # H/W are STATIC in the exported programs (only batch is
                # symbolic) — reject here instead of a cryptic aval
                # mismatch at the first dispatch
                raise ValueError(
                    f"artifact was exported at {self.artifact.new_size}px; "
                    f"new_size={new_size} cannot be served from it")
            self.new_size = self.artifact.new_size
        else:
            from munit_tpu.train import GenBundle
            self.gen = GenBundle(conf)
            self.params = gen_params
            self.new_size = new_size or conf["new_size"]
        self.quant = quant == "int8"
        self._scales = None  # per-site activation maxima (int8 calibration)
        self.styles: Dict[str, jax.Array] = {}
        self._style_imgs: Dict[str, jax.Array] = {}
        self._lock = threading.Lock()
        self._direct_limit = 64   # non-batched path admission bound
        self._direct_slots = threading.BoundedSemaphore(self._direct_limit)

        # Data-parallel serving: with >1 chip visible, shard every batched
        # dispatch over a (data,) mesh — params replicated, batch split
        # over ICI-connected chips, XLA inserts no collectives for pure
        # inference (every sample is independent). "auto" uses all devices.
        self.mesh = None
        self.n_dev = 1
        if mesh != "off" and len(jax.devices()) > 1:
            from munit_tpu.dist import mesh as M
            self.mesh = M.make_mesh()
            self.n_dev = self.mesh.shape["data"]
            self._dsh = M.data_sharding(self.mesh)
            if self.params is not None:
                self.params = jax.device_put(self.params,
                                             M.replicated(self.mesh))
            if max_batch > 1:  # batched serving: buckets must fill the mesh
                max_batch = max(max_batch, self.n_dev)
                if max_batch % self.n_dev:
                    max_batch += self.n_dev - max_batch % self.n_dev

        if self.artifact is not None:
            def _body(x_a, s_b):
                return self.artifact.translate_call(x_a, s_b)
        else:
            def _body(x_a, s_b):
                c_a, _ = self.gen.encode(self.params, x_a, 1)
                return self.gen.decode(self.params, c_a, s_b, 2)

        self._body = _body

        def _translate(x_a, s_b):
            # static W8A8: per-site scales are baked at trace time (warmup
            # calibrates before the first translate trace). Dynamic mode
            # measured SLOWER than bf16 e2e (BENCH.md) — int8 here always
            # means calibrated-static.
            if self.quant and self._scales is not None:
                with ops.conv_quant(scales=self._scales):
                    return _body(x_a, s_b)
            return _body(x_a, s_b)

        if self.artifact is not None:
            _encode_body = self.artifact.encode_style_call
        else:
            _encode_body = lambda x: self.gen.encode(self.params, x, 2)[1]  # noqa: E731

        if self.mesh is not None:
            from munit_tpu.dist import mesh as M
            self._translate = jax.jit(
                _translate, in_shardings=(self._dsh, self._dsh),
                out_shardings=self._dsh)
            # style encode runs once per style: replicate the batch-1 input
            self._encode_style = jax.jit(
                _encode_body,
                in_shardings=M.replicated(self.mesh),
                out_shardings=M.replicated(self.mesh))
        else:
            self._translate = jax.jit(_translate)
            self._encode_style = jax.jit(_encode_body)
        self.batcher: Optional[MicroBatcher] = None
        if max_batch > 1:
            self.batcher = MicroBatcher(self._run_padded, max_batch,
                                        max_wait_ms, min_batch=self.n_dev,
                                        max_queue=max_queue)

    def _run_padded(self, x, s):
        """Pad the batch to a multiple of the mesh's data axis, dispatch,
        slice back. No-op padding on a single device."""
        n = x.shape[0]
        b = -(-n // self.n_dev) * self.n_dev
        if b > n:
            x = jnp.concatenate(
                [jnp.asarray(x), jnp.repeat(jnp.asarray(x[-1:]), b - n,
                                            axis=0)], axis=0)
            s = jnp.concatenate([s, jnp.repeat(s[-1:], b - n, axis=0)],
                                axis=0)
        x = jnp.asarray(x)
        if self.mesh is not None:
            # style codes come out of _encode_style REPLICATED; jit rejects
            # committed arrays whose sharding differs from in_shardings
            x = jax.device_put(x, self._dsh)
            s = jax.device_put(s, self._dsh)
        y = self._translate(x, s)
        return y[:n] if b > n else y

    def _prep(self, img: Image.Image) -> jax.Array:
        from munit_tpu.data import transforms as T
        img = T.resize_shorter(img.convert("RGB"), self.new_size)
        w, h = img.size
        s = self.new_size
        img = T.crop(img, (h - s) // 2, (w - s) // 2, s, s)
        return jnp.asarray(T.normalize_pm1(T.to_array01(img)))[None]

    def add_style(self, name: str, exemplar: Image.Image):
        prepped = self._prep(exemplar)
        self._style_imgs[name] = prepped
        self.styles[name] = self._encode_style(prepped)

    def calibrate(self, images=None):
        """Record per-site activation maxima for the static-int8 path.

        images: iterable of PIL images to use as content; defaults to the
        style exemplars (real photos of the target domains). Call before
        warmup(); warmup() calls this automatically when needed.
        """
        from munit_tpu.core import ops as _ops
        if not self.quant:
            return
        arrs = ([self._prep(im) for im in images] if images
                else list(self._style_imgs.values()))
        if not arrs:
            raise RuntimeError("int8 calibration needs at least one style")
        x = jnp.concatenate(arrs, axis=0)
        if x.shape[0] % self.n_dev:
            pad = self.n_dev - x.shape[0] % self.n_dev
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        s1 = next(iter(self.styles.values()))
        s = jnp.concatenate([s1] * x.shape[0], axis=0)
        if self.mesh is not None:
            x = jax.device_put(x, self._dsh)
            s = jax.device_put(s, self._dsh)

        @jax.jit
        def record(x, s):
            rec = []
            with _ops.conv_quant(record=rec):
                out = self._body(x, s)
            return out, jnp.stack(rec)

        _, mx = record(x, s)
        self._scales = [1.1 * float(v) for v in np.asarray(mx)]

    def warmup(self):
        if not self.styles:
            return
        if self.quant and self._scales is None:
            self.calibrate()
        s1 = next(iter(self.styles.values()))
        sizes = (self.batcher.buckets if self.batcher
                 else [self.n_dev])  # direct path pads 1 -> n_dev
        for b in sizes:  # pre-compile every serving batch shape
            x = jnp.zeros((b, self.new_size, self.new_size, 3))
            s = jnp.concatenate([s1] * b, axis=0)
            if self.mesh is not None:
                x = jax.device_put(x, self._dsh)
                s = jax.device_put(s, self._dsh)
            jax.block_until_ready(self._translate(x, s))

    def translate(self, img: Image.Image, style: str = "default") -> Image.Image:
        if style not in self.styles:
            raise KeyError(f"unknown style '{style}'")
        if self.batcher is not None:
            out = self.batcher.submit(np.asarray(self._prep(img)),
                                      self.styles[style])
        else:
            # same admission control the micro-batcher applies: bound the
            # threads waiting on the dispatch lock instead of queueing a
            # request flood unboundedly (one HTTP thread per connection)
            if not self._direct_slots.acquire(blocking=False):
                raise Overloaded(
                    f"queue full ({self._direct_limit} waiting requests)")
            try:
                with self._lock:  # single program stream; serialize dispatch
                    out = self._run_padded(self._prep(img),
                                           self.styles[style])
            finally:
                self._direct_slots.release()
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
                    "n_devices": service.n_dev,
                    "styles": sorted(service.styles),
                    "batching": service.batcher is not None,
                }).encode()
            elif self.path.startswith("/stats"):
                st = (service.batcher.stats_snapshot()
                      if service.batcher else {})
                if st.get("batches"):
                    st["mean_batch"] = round(
                        st["requests"] / st["batches"], 3)
                    st["mean_device_ms"] = round(
                        st["device_ms"] / st["batches"], 3)
                body = json.dumps(st).encode()
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

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
            except Overloaded as e:
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(503)
                self.send_header("Retry-After", "1")
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            except Exception as e:  # noqa: BLE001
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
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


class _Server(ThreadingHTTPServer):
    # stdlib default request_queue_size (the listen(2) backlog) is 5 —
    # under a burst of simultaneous connects the kernel refuses the
    # overflow and clients see connection errors BEFORE admission control
    # ever runs (r4 load test: 28 refused connects at 64 clients). Raise
    # it well past any sane client count so overload is always answered by
    # the micro-batcher's 503 + Retry-After, never by a TCP RST.
    request_queue_size = 256


def serve(service: TranslationService, port: int = 8787,
          host: str = "127.0.0.1") -> ThreadingHTTPServer:
    server = _Server((host, port), _make_handler(service))
    return server


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None,
                   help="required unless --artifact is given")
    p.add_argument("--checkpoint", default=None,
                   help="required unless --artifact is given")
    p.add_argument("--artifact", default=None,
                   help="AOT deployment artifact (.jexp.zip from "
                        "checkpoint_tools export-aot) — serves without "
                        "config/checkpoint/model code")
    p.add_argument("--style", required=True, action="append",
                   help="style exemplar image, 'path' or 'name=path'; "
                        "repeatable — the first is also served as 'default'")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--max-batch", type=int, default=8,
                   help="micro-batcher cap (1 disables batching)")
    p.add_argument("--max-wait-ms", type=float, default=4.0,
                   help="max coalescing wait after the first request")
    p.add_argument("--quant", choices=["none", "int8"], default="none",
                   help="int8: calibrated-static W8A8 generator convs")
    p.add_argument("--calib-dir", default=None,
                   help="folder of content images for int8 calibration "
                        "(default: the style exemplars)")
    p.add_argument("--mesh", choices=["auto", "off"], default="auto",
                   help="auto: shard batched dispatches over all visible "
                        "chips (data-parallel serving)")
    p.add_argument("--max-queue", type=int, default=None,
                   help="admission-control bound on waiting requests; "
                        "overflow is shed with 503 + Retry-After "
                        "(default: MicroBatcher's 8x max-batch)")
    opts = p.parse_args(argv)

    # Persistent compile cache (same policy as cli/train): the per-bucket
    # warmup jits cost minutes cold over a remote-compile tunnel; restarts
    # (deploys, crash recovery, load tests) should pay seconds.
    import jax
    cache = os.environ.get("MUNIT_JIT_CACHE")
    if cache is None:
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        cache = os.path.join(
            repo, ".jax_cache" if jax.default_backend() != "cpu"
            else ".jax_cache_cpu")
    if cache:
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except OSError as e:
            print(f"WARNING: compile cache disabled ({e})")

    if opts.artifact:
        svc = TranslationService(artifact=opts.artifact,
                                 max_batch=opts.max_batch,
                                 max_wait_ms=opts.max_wait_ms,
                                 quant=opts.quant, mesh=opts.mesh,
                                 max_queue=opts.max_queue)
    else:
        if not (opts.config and opts.checkpoint):
            p.error("--config and --checkpoint are required without "
                    "--artifact")
        from munit_tpu.cli.translate import load_gen_params
        from munit_tpu.config import get_config
        conf = get_config(opts.config)
        svc = TranslationService(conf, load_gen_params(opts.checkpoint, conf),
                                 max_batch=opts.max_batch,
                                 max_wait_ms=opts.max_wait_ms,
                                 quant=opts.quant, mesh=opts.mesh,
                                 max_queue=opts.max_queue)
    for i, spec in enumerate(opts.style):
        name, _, path = spec.rpartition("=")
        img = Image.open(path or spec)
        if i == 0:
            svc.add_style("default", img)
        if name:
            svc.add_style(name, img)
    if opts.quant == "int8" and opts.calib_dir:
        import glob as _glob
        paths = sorted(_glob.glob(os.path.join(opts.calib_dir, "*")))[:8]
        svc.calibrate([Image.open(pth) for pth in paths])
    svc.warmup()
    server = serve(svc, opts.port)
    print(f"serving on :{opts.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
