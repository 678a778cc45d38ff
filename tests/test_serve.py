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


def make_service(max_batch=1, max_wait_ms=4.0, quant="none", mesh="off"):
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
    svc = TranslationService(conf, params, max_batch=max_batch,
                             max_wait_ms=max_wait_ms, quant=quant, mesh=mesh)
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


def test_mesh_sharded_serving_matches_single_device():
    """Data-parallel serving on the fake 8-device mesh: batched dispatches
    shard over the data axis; direct (batch-1) requests pad to n_dev and
    slice back. Outputs must match the single-device service."""
    svc1 = make_service(mesh="off")
    svcm = make_service(max_batch=8, max_wait_ms=20.0, mesh="auto")
    assert svcm.n_dev == 8
    assert svcm.batcher.buckets == [8]
    rng = np.random.RandomState(11)
    imgs = [Image.fromarray(rng.randint(0, 255, (48, 52, 3), np.uint8))
            for _ in range(5)]
    singles = [svc1.translate(im) for im in imgs]

    outs = [None] * len(imgs)

    def worker(i):
        outs[i] = svcm.translate(imgs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for got, want in zip(outs, singles):
        a, b = np.asarray(got, np.int16), np.asarray(want, np.int16)
        assert np.abs(a - b).max() <= 1

    # direct (no-batcher) mesh service: pads 1 -> 8 under the hood
    svcd = make_service(mesh="auto")
    assert svcd.batcher is None and svcd.n_dev == 8
    got = np.asarray(svcd.translate(imgs[0]), np.int16)
    want = np.asarray(singles[0], np.int16)
    assert np.abs(got - want).max() <= 1
    svcm.batcher.close()


def test_service_quant_int8_close_to_full_precision():
    svc = make_service()
    svcq = make_service(quant="int8")
    rng = np.random.RandomState(7)
    img = Image.fromarray(rng.randint(0, 255, (48, 52, 3), np.uint8))
    a = np.asarray(svc.translate(img), np.int16)
    b = np.asarray(svcq.translate(img), np.int16)
    # uint8 images after min-max normalize: demand sub-perceptual agreement
    assert np.abs(a - b).mean() < 4.0, np.abs(a - b).mean()


def test_microbatcher_coalesces_and_matches_unbatched():
    """Concurrent requests share device dispatches; per-sample outputs are
    identical to the unbatched path (every norm in the net is per-sample)."""
    svc1 = make_service(max_batch=1)
    svcb = make_service(max_batch=4, max_wait_ms=40.0)
    rng = np.random.RandomState(1)
    imgs = [Image.fromarray(rng.randint(0, 255, (48, 52, 3), np.uint8))
            for _ in range(8)]
    singles = [svc1.translate(im) for im in imgs]

    outs = [None] * len(imgs)

    def worker(i):
        outs[i] = svcb.translate(imgs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for got, want in zip(outs, singles):
        a, b = np.asarray(got, np.int16), np.asarray(want, np.int16)
        assert np.abs(a - b).max() <= 1  # one quantization step of slack

    st = svcb.batcher.stats
    assert st["requests"] == 8
    assert st["batches"] < 8, f"no coalescing happened: {st}"
    svcb.batcher.close()


def test_microbatcher_adaptive_no_wait_when_idle():
    """Sparse traffic must not pay the coalescing wait: a lone request
    through a batcher with a huge max_wait returns ~immediately."""
    import time as _t
    from munit_tpu.serve import MicroBatcher

    mb = MicroBatcher(lambda x, s: np.asarray(x) * 2.0,
                      max_batch=8, max_wait_ms=5000.0)
    t0 = _t.monotonic()
    out = mb.submit(np.ones((1, 2, 2, 3), np.float32), np.zeros((1, 4)))
    dt = _t.monotonic() - t0
    assert np.array_equal(out, np.full((1, 2, 2, 3), 2.0, np.float32))
    assert dt < 1.0, f"idle request waited {dt:.2f}s for coalescing"
    mb.close()


def test_microbatcher_pads_to_bucket_and_fans_out_errors():
    from munit_tpu.serve import MicroBatcher

    calls = []

    def run(x, s):
        calls.append(x.shape[0])
        if float(np.max(np.asarray(x))) > 100:
            raise ValueError("boom")
        return np.asarray(x) * 2.0

    mb = MicroBatcher(run, max_batch=4, max_wait_ms=30.0)
    xs = [np.full((1, 2, 2, 3), i, np.float32) for i in range(3)]
    outs = [None] * 3
    errs = [None] * 3

    def worker(i, style):
        try:
            outs[i] = mb.submit(xs[i], style)
        except Exception as e:  # noqa: BLE001
            errs[i] = e

    s_ok = np.zeros((1, 4), np.float32)
    ts = [threading.Thread(target=worker, args=(i, s_ok)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(e is None for e in errs)
    for i in range(3):
        assert np.array_equal(outs[i], xs[i] * 2.0)
    assert all(c in (1, 2, 4) for c in calls)  # bucketed shapes only

    # error fan-out: every waiter in the failing batch sees the exception
    try:
        mb.submit(np.full((1, 2, 2, 3), 999.0, np.float32), s_ok)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    mb.close()


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


def test_microbatcher_sheds_load_when_queue_full():
    """Admission control: beyond max_queue waiting requests, submit raises
    Overloaded (HTTP 503 upstream) instead of queueing unboundedly."""
    import time
    from munit_tpu.serve.server import MicroBatcher, Overloaded

    release = threading.Event()

    def slow_run(x, s):
        release.wait(5.0)
        return x

    mb = MicroBatcher(slow_run, max_batch=1, max_wait_ms=1.0, max_queue=2)
    results = []

    def worker():
        try:
            mb.submit(np.zeros((1, 4, 4, 3), np.float32), np.zeros((1, 2)))
            results.append("ok")
        except Overloaded:
            results.append("shed")

    threads = [threading.Thread(target=worker) for _ in range(6)]
    for t in threads:
        t.start()
        time.sleep(0.02)   # let the queue actually fill in order
    release.set()
    for t in threads:
        t.join(timeout=10)
    assert "shed" in results           # at least one rejected
    assert results.count("ok") >= 3    # dispatcher drained the rest
    assert mb.stats["rejected"] == results.count("shed")
    mb.close()


def test_direct_path_sheds_load_too():
    """--max-batch 1 (no batcher) still applies admission control: threads
    beyond the direct-path bound get Overloaded instead of queueing on the
    dispatch lock unboundedly."""
    import time
    from munit_tpu.serve.server import Overloaded

    svc = make_service(max_batch=1)
    release = threading.Event()
    orig = svc._run_padded

    def slow_run(x, s):
        release.wait(5.0)
        return orig(x, s)

    svc._run_padded = slow_run
    svc._direct_limit = 2
    svc._direct_slots = threading.BoundedSemaphore(2)

    rng = np.random.RandomState(2)
    img = Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8))
    results = []

    def worker():
        try:
            svc.translate(img)
            results.append("ok")
        except Overloaded:
            results.append("shed")

    threads = [threading.Thread(target=worker) for _ in range(5)]
    for t in threads:
        t.start()
        time.sleep(0.05)
    release.set()
    for t in threads:
        t.join(timeout=10)
    assert results.count("shed") == 3 and results.count("ok") == 2
