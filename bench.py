"""Benchmark: 256x256 MUNIT training throughput (images/sec/chip).

Measures the full config_256.yaml loss set (dis update every iteration +
gen update every ratio_disc_gen=5, incl. masked cycle + semantic loss against
the frozen ResNet34-8s segmenter) on one chip, steady-state.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: ratio against REFERENCE_H100_IMAGES_PER_SEC — an estimate of the
PyTorch reference's single-H100 throughput on the same workload (the reference
publishes no numbers, BASELINE.md; the estimate is ~20 img/s for batch-1
dis+gen cadence at 256²). BASELINE.json's target is vs_baseline >= 5.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_H100_IMAGES_PER_SEC = 20.0
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
WARMUP = 4
ITERS = int(os.environ.get("BENCH_ITERS", "30"))
CROP = 256


def main():
    import jax
    import jax.numpy as jnp
    from munit_tpu.config import validate
    from munit_tpu.train import MUNITTrainer

    dev = jax.devices()[0]
    conf = validate({
        "gen_state": 1, "guided": 1, "semantic_w": 3, "recon_mask": 1,
        "batch_size": BATCH, "ratio_disc_gen": 5,
        "new_size": CROP, "crop_image_height": CROP, "crop_image_width": CROP,
    })

    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" \
        else jnp.float32
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0), dtype=jnp.float32)
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))

    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3).astype(np.float32))
    x_b = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(BATCH, CROP, CROP, 1) > 0.5)
                       .astype(np.float32))

    def one_iter(it):
        tr.iterations = it
        tr.dis_update(x_a, x_b)
        if (it + 1) % conf["ratio_disc_gen"] == 0:
            tr.gen_update(x_a, x_b, mask, mask)

    for it in range(WARMUP):
        one_iter(it)
    jax.block_until_ready(tr.state["gen"])

    t0 = time.time()
    for it in range(WARMUP, WARMUP + ITERS):
        one_iter(it)
    jax.block_until_ready(tr.state["gen"])
    dt = time.time() - t0

    images_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "munit_256_train_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / REFERENCE_H100_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
