"""Concurrency load test for the HTTP serving path (VERDICT r4 #5).

Starts the real server (subprocess, stdlib HTTP + MicroBatcher) on a
random-weight production-shape generator, then drives it with N concurrent
closed-loop clients for a fixed duration per level. Reports p50/p99
latency, sustained throughput, HTTP 503 shed rate, and the server's own
batch-size histogram (/stats) — replacing the single-dispatch
extrapolation with measured saturation behavior.

    python tools/serve_loadtest.py --outdir /tmp/serve_lt \
        --levels 4,16,64 --duration 60
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request
import urllib.error

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def setup(outdir: str, size: int, dim: int):
    """Random-weight generator checkpoint (.npz pack) + config + images."""
    from PIL import Image
    import yaml
    import jax
    import jax.numpy as jnp
    from munit_tpu.config import validate
    from munit_tpu.train import MUNITTrainer
    from munit_tpu.io.checkpoint import save_inference_params

    os.makedirs(outdir, exist_ok=True)
    conf = validate({
        "gen_state": 1, "guided": 1,
        "new_size": size, "crop_image_height": size,
        "crop_image_width": size,
        "gen": {"dim": dim, "mlp_dim": 256, "style_dim": 16,
                "activ": "relu", "n_downsample": 2, "n_res": 4,
                "pad_type": "reflect"},
    })
    conf_path = os.path.join(outdir, "serve.yaml")
    keep = {k: conf[k] for k in ("gen_state", "guided", "new_size",
                                 "crop_image_height", "crop_image_width",
                                 "gen", "input_dim_a", "input_dim_b")}
    with open(conf_path, "w") as f:
        yaml.safe_dump(keep, f)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0), image_size=size)
    ckpt = os.path.join(outdir, "gen_pack.npz")
    save_inference_params(ckpt, jax.tree.map(np.asarray, tr.state["gen"]))
    rng = np.random.RandomState(0)
    style = os.path.join(outdir, "style.png")
    Image.fromarray((rng.rand(size, size, 3) * 255).astype(np.uint8)) \
         .save(style)
    content = os.path.join(outdir, "content.jpg")
    Image.fromarray((rng.rand(size, size, 3) * 255).astype(np.uint8)) \
         .save(content, quality=90)
    return conf_path, ckpt, style, content


def fetch_stats(port):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=10) as r:
        return json.loads(r.read())


def client_loop(port, body, stop_t, lat, codes, retry_after):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/translate", data=body,
        headers={"Content-Type": "image/jpeg"})
    while time.time() < stop_t:
        t0 = time.time()
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                r.read()
                code = r.status
        except urllib.error.HTTPError as e:
            e.read()
            code = e.code
            if e.headers.get("Retry-After"):
                retry_after[0] += 1
        except Exception:
            code = -1
        lat.append((time.time() - t0, code))
        codes[code] = codes.get(code, 0) + 1


def run_level(port, body, n_clients, duration):
    stats0 = fetch_stats(port)
    lat, codes, retry_after = [], {}, [0]
    stop_t = time.time() + duration
    threads = [threading.Thread(target=client_loop,
                                args=(port, body, stop_t, lat, codes,
                                      retry_after))
               for _ in range(n_clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    stats1 = fetch_stats(port)
    ok = sorted(l for l, c in lat if c == 200)
    shed = sum(v for k, v in codes.items() if k == 503)
    total = len(lat)
    hist0 = stats0.get("batch_hist", {})
    hist1 = stats1.get("batch_hist", {})
    dhist = {k: hist1.get(k, 0) - hist0.get(k, 0)
             for k in set(hist0) | set(hist1)}
    dhist = {k: v for k, v in sorted(dhist.items(),
                                     key=lambda kv: int(kv[0])) if v}
    row = {
        "clients": n_clients, "duration_s": round(dt, 1),
        "completed": len(ok), "throughput_rps": round(len(ok) / dt, 2),
        "p50_ms": round(1e3 * ok[len(ok) // 2], 1) if ok else None,
        "p99_ms": round(1e3 * ok[int(len(ok) * 0.99)], 1) if ok else None,
        "shed_503": shed, "shed_rate": round(shed / max(total, 1), 3),
        "retry_after_hdrs": retry_after[0],
        "errors": sum(v for k, v in codes.items() if k not in (200, 503)),
        "batch_hist": dhist,
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--levels", default="4,16,64")
    p.add_argument("--duration", type=float, default=60)
    p.add_argument("--port", type=int, default=8791)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-queue", type=int, default=None,
                   help="pass a small bound to force admission control "
                        "(503 shedding) under load")
    p.add_argument("--aot", action="store_true",
                   help="serve from an AOT .jexp.zip artifact "
                        "(checkpoint_tools export-aot) instead of "
                        "config+checkpoint — the deployment path column")
    p.add_argument("--startup-timeout", type=float, default=900)
    args = p.parse_args()

    conf_path, ckpt, style, content = setup(args.outdir, args.size, args.dim)
    body = open(content, "rb").read()

    if args.aot:
        artifact = os.path.join(args.outdir, "model.jexp.zip")
        rc = subprocess.call(
            [sys.executable, "-m", "munit_tpu", "checkpoint_tools",
             "export-aot", "--config", conf_path, "--ckpt", ckpt,
             "--out", artifact],
            env={**os.environ,
                 "PYTHONPATH": REPO + os.pathsep
                 + os.environ.get("PYTHONPATH", "")})
        if rc:
            raise RuntimeError(f"export-aot failed rc={rc}")
        cmd = [sys.executable, "-m", "munit_tpu", "serve",
               "--artifact", artifact, "--style", style,
               "--port", str(args.port), "--max-batch", str(args.max_batch)]
    else:
        cmd = [sys.executable, "-m", "munit_tpu", "serve",
               "--config", conf_path, "--checkpoint", ckpt, "--style", style,
               "--port", str(args.port), "--max-batch", str(args.max_batch)]
    if args.max_queue is not None:
        cmd += ["--max-queue", str(args.max_queue)]
    env = dict(os.environ)
    # APPEND to PYTHONPATH: replacing it drops /root/.axon_site,
    # whose sitecustomize registers the axon TPU PJRT plugin
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    log = open(os.path.join(args.outdir, "server.log"), "w")
    proc = subprocess.Popen(cmd, env=env, stdout=log, stderr=log)
    try:
        t0 = time.time()
        while True:  # wait for warmup (jit compiles all buckets)
            try:
                fetch_stats(args.port)
                break
            except Exception:
                if proc.poll() is not None:
                    raise RuntimeError(
                        "server died during startup; see server.log")
                if time.time() - t0 > args.startup_timeout:
                    raise RuntimeError("server startup timed out")
                time.sleep(2)
        print(f"server up in {time.time() - t0:.0f}s; starting load",
              flush=True)
        rows = []
        for lvl in [int(x) for x in args.levels.split(",")]:
            rows.append(run_level(args.port, body, lvl, args.duration))
        with open(os.path.join(args.outdir, "loadtest.json"), "w") as f:
            json.dump(rows, f, indent=1)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


if __name__ == "__main__":
    main()
