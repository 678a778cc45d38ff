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

    @jax.jit
    def translate(x_a, style_img):
        c_a, _ = gen.encode(params, x_a, 1)
        _, s_b = gen.encode(params, style_img, 2)
        return gen.decode(params, c_a, s_b, 2)

    rng = np.random.RandomState(0)
    results = {}
    for batch in (1, 8, 32):
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
