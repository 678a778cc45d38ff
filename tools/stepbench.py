"""Per-step timing of the train-step family at the bench workload.

Times each jitted step in isolation (N reps, scalar-fetch barrier) to
attribute the cadence budget: 4x dis-only + 1x fused dis+gen per 5
iterations.

  python tools/stepbench.py
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("MUNIT_PALLAS", "0")
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
CROP = 256
REPS = int(os.environ.get("BENCH_REPS", "20"))


def main():
    import jax
    import jax.numpy as jnp
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.config import validate
    from munit_tpu.core import ops
    from munit_tpu.train import MUNITTrainer

    conf = validate({
        "gen_state": 1, "guided": 1, "semantic_w": 3, "recon_mask": 1,
        "batch_size": BATCH, "ratio_disc_gen": 5,
        "new_size": CROP, "crop_image_height": CROP, "crop_image_width": CROP,
    })
    ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))

    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3), jnp.bfloat16)
    x_b = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3), jnp.bfloat16)
    mask = jnp.asarray((rng.rand(BATCH, CROP, CROP, 1) > 0.5)
                       .astype(np.float32))

    def sync(m):
        return float(list(m.values())[0])

    def timeit(name, fn, reps=REPS):
        sync(fn())  # compile + warm
        sync(fn())
        t0 = time.time()
        for _ in range(reps):
            m = fn()
        sync(m)
        dt = (time.time() - t0) / reps
        print(f"{name:28s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    tr.iterations = 0
    t_dis = timeit("dis step", lambda: tr.dis_update(x_a, x_b))
    tr.iterations = 4
    t_fused = timeit("fused dis+gen step",
                     lambda: tr.dis_gen_update(x_a, x_b, mask, mask))
    cadence = 4 * t_dis + t_fused
    print(f"cadence (4 dis + 1 fused): {cadence * 1e3:8.2f} ms  -> "
          f"{5 * BATCH / cadence:6.2f} img/s")
    tr.iterations = 4
    t_gen = timeit("gen step (unfused)",
                   lambda: tr.gen_update(x_a, x_b, mask, mask))
    print(f"unfused cadence: {(5 * t_dis + t_gen) * 1e3:8.2f} ms -> "
          f"{5 * BATCH / (5 * t_dis + t_gen):6.2f} img/s")


if __name__ == "__main__":
    main()
