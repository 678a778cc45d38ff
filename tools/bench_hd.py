"""HD (config_HD.yaml: 512² crops) training throughput on one chip.

Tries the given batch/remat combination and reports img/s — VERDICT r1
next-round #6 (the r1 round never ran HD on the TPU; HBM fit unproven).

  BENCH_BATCH=2 BENCH_REMAT=pads python tools/bench_hd.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("MUNIT_PALLAS", "0")
# 512² crops: keep the frozen segmenter rematerialized (HBM over speed)
os.environ.setdefault("MUNIT_SEG_REMAT", "1")

BATCH = int(os.environ.get("BENCH_BATCH", "2"))
CROP = 512
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def main():
    import jax
    import jax.numpy as jnp
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.config import validate
    from munit_tpu.core import ops
    from munit_tpu.train import MUNITTrainer

    ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)
    # config_HD.yaml:73-75 sizes; loss set as shipped (semantic_w=3 like 256)
    conf = validate({
        "gen_state": 1, "guided": 1, "semantic_w": 3, "recon_mask": 1,
        "batch_size": BATCH, "ratio_disc_gen": 5,
        "new_size": 600, "crop_image_height": CROP,
        "crop_image_width": CROP,
    })
    remat_env = os.environ.get("BENCH_REMAT", "")
    remat = {"1": True, "pads": "pads", "hd": "hd", "0": False}.get(remat_env, None)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0), remat=remat)
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))

    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3), jnp.bfloat16)
    x_b = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3), jnp.bfloat16)
    mask = jnp.asarray((rng.rand(BATCH, CROP, CROP, 1) > 0.5)
                       .astype(np.float32))

    def one_iter(it):
        tr.iterations = it
        # same cadence/protocol as bench.py: fused dis+gen on gen iterations
        if (it + 1) % conf["ratio_disc_gen"] == 0 and tr.fused:
            return tr.dis_gen_update(x_a, x_b, mask, mask)
        m = tr.dis_update(x_a, x_b)
        if (it + 1) % conf["ratio_disc_gen"] == 0:
            m = tr.gen_update(x_a, x_b, mask, mask)
        return m

    def sync(m):
        return float(list(m.values())[0])

    print(f"HD bench: batch={BATCH} remat={remat} — compiling dis...",
          file=sys.stderr, flush=True)
    sync(one_iter(0))
    print("compiling gen...", file=sys.stderr, flush=True)
    sync(one_iter(conf["ratio_disc_gen"] - 1))
    for it in range(2):
        m = one_iter(it)
    sync(m)
    t0 = time.time()
    for it in range(2, 2 + ITERS):
        m = one_iter(it)
    sync(m)
    dt = time.time() - t0
    print(f"HD 512²: {ITERS} iters in {dt:.2f}s → "
          f"{BATCH * ITERS / dt:.2f} img/s/chip "
          f"(batch={BATCH}, remat={remat})")


if __name__ == "__main__":
    main()
