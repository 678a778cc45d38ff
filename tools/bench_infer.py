"""Inference benchmark: guided single-image translation latency + batched
throughput (test.py / test_batch.py workload, BASELINE.json metric 2).

  python tools/bench_infer.py
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from munit_tpu.config import validate
    from munit_tpu.core import ops
    from munit_tpu.train import MUNITTrainer

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if os.environ.get("BENCH_BF16", "1") == "1":
        ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)

    conf = validate({"gen_state": 1, "guided": 1})
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0), image_size=256)
    gen, params = tr.gen, tr.state["gen"]
    # BENCH_QUANT: "" (bf16), "dynamic" (per-dispatch scales), or "static"
    # (one record pass bakes per-site scales as constants)
    quant = os.environ.get("BENCH_QUANT", "")
    if quant == "1":
        quant = "dynamic"

    def body(x_a, style_img):
        c_a, _ = gen.encode(params, x_a, 1)
        _, s_b = gen.encode(params, style_img, 2)
        return gen.decode(params, c_a, s_b, 2)

    scales = None
    if quant == "static":
        rng0 = np.random.RandomState(42)

        @jax.jit
        def record(x_a, style_img):
            rec = []
            with ops.conv_quant(record=rec):
                out = body(x_a, style_img)
            return out, jnp.stack(rec)

        import jax.numpy as jnp  # noqa: F811 (local clarity)
        _, mx = record(
            jnp.asarray(rng0.randn(8, 256, 256, 3).astype(np.float32)),
            jnp.asarray(rng0.randn(8, 256, 256, 3).astype(np.float32)))
        scales = [1.1 * float(v) for v in np.asarray(mx)]  # 10% headroom

    @jax.jit
    def translate(x_a, style_img):
        if quant == "static":
            with ops.conv_quant(scales=scales):
                return body(x_a, style_img)
        with ops.conv_quant(quant == "dynamic"):
            return body(x_a, style_img)

    rng = np.random.RandomState(0)
    results = {}
    batches = tuple(int(b) for b in
                    os.environ.get("BENCH_BATCHES", "1,8,32").split(","))

    if os.environ.get("BENCH_AOT", "0") == "1":
        # A/B the AOT deployment artifact (jax.export serialized program,
        # symbolic batch) against the jit path on the SAME serving dispatch
        # (precomputed style code, as serve does)
        from munit_tpu.io.aot import export_translator
        ex = export_translator(gen, params, 256,
                               platforms=(jax.devices()[0].platform,))
        aot_translate = jax.jit(ex["translate"].call)

        @jax.jit
        def jit_translate(x_a, s_b):
            c_a, _ = gen.encode(params, x_a, 1)
            return gen.decode(params, c_a, s_b, 2)

        s_code = jax.jit(lambda x: gen.encode(params, x, 2)[1])(
            jnp.asarray(rng.randn(1, 256, 256, 3).astype(np.float32)))
        for batch in batches:
            x = jnp.asarray(rng.randn(batch, 256, 256, 3).astype(np.float32))
            s = jnp.broadcast_to(s_code, (batch,) + s_code.shape[1:])
            s = jnp.asarray(s)
            for name, fn in (("jit", jit_translate), ("aot", aot_translate)):
                out = fn(x, s)
                float(out[0, 0, 0, 0])
                iters = 20
                t0 = time.time()
                for _ in range(iters):
                    out = fn(x, s)
                float(out[0, 0, 0, 0])
                dt = time.time() - t0
                results[f"{name}_batch{batch}_ms_per_image"] = round(
                    dt / iters / batch * 1000, 3)
        print(json.dumps(results))
        return
    for batch in batches:
        x = jnp.asarray(rng.randn(batch, 256, 256, 3).astype(np.float32))
        s = jnp.asarray(rng.randn(batch, 256, 256, 3).astype(np.float32))
        out = translate(x, s)
        float(out[0, 0, 0, 0])  # compile + sync
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            out = translate(x, s)
        float(out[0, 0, 0, 0])
        dt = time.time() - t0
        results[f"batch{batch}_ms_per_image"] = round(
            dt / iters / batch * 1000, 3)
        results[f"batch{batch}_images_per_sec"] = round(batch * iters / dt, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
