"""Attribute the grad_accum K>1 slowdown across the steps of one cadence.

The r4 rows say K=2 runs at 63.95 img/s vs 121.91 fused K=1 — a 48% cost,
where the fused-vs-unfused forward sharing only explains ~6%. This probe
times each jitted step in isolation at K in {1, 2, 4} on the bench workload
(batch 8, 256², bf16, config_256 loss surface) to locate the rest:

  dis-only step     (4 of every 5 iterations)
  gen step          (unfused; 1 of 5)
  fused dis+gen     (K=1 only; 1 of 5)

and prints the implied 5-iteration cycle time per K.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/accumprobe.py
"""

import os
import time

import numpy as np

os.environ.setdefault("MUNIT_PALLAS", "0")
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
CROP = int(os.environ.get("BENCH_CROP", "256"))
REPS = int(os.environ.get("BENCH_REPS", "20"))


def main():
    import jax
    import jax.numpy as jnp
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.config import validate
    from munit_tpu.core import ops

    conf = validate({
        "gen_state": 1, "guided": 1, "semantic_w": 3, "recon_mask": 1,
        "batch_size": BATCH, "ratio_disc_gen": 5,
        "new_size": CROP, "crop_image_height": CROP, "crop_image_width": CROP,
    })
    ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)

    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3), jnp.bfloat16)
    x_b = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3), jnp.bfloat16)
    mask = jnp.asarray((rng.rand(BATCH, CROP, CROP, 1) > 0.5)
                       .astype(np.float32))
    z_sem = jnp.zeros((BATCH, CROP, CROP), jnp.int32)
    lr0 = jnp.asarray(1e-4, jnp.float32)

    def scalar_of(tree):
        leaves = jax.tree.leaves(tree)
        return float(jnp.asarray(leaves[0]).reshape(-1)[0])

    def timeit(name, fn, reps=REPS):
        t0 = time.time()
        scalar_of(fn())
        print(f"{name:40s} compile+1 {time.time() - t0:6.1f}s", flush=True)
        scalar_of(fn())
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = fn()
        scalar_of(out)
        dt = (time.time() - t0) / reps
        print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    results = {}
    for K in (1, 2, 4):
        os.environ["MUNIT_GRAD_ACCUM"] = str(K)
        from munit_tpu.train import MUNITTrainer
        tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
        tr.load_segmenter(tr.seg_model_def.init(
            jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))
        frozen = tr.frozen
        hold = {"s": tr.state}   # the step DONATES its state argument —
        # rebind the returned state every call or the second call reads
        # freed buffers (TPU InvalidArgument)

        def dis_fn():
            s, m = tr._dis_step(hold["s"], x_a, x_b, lr0, False)
            hold["s"] = s
            return m

        def fused_fn():
            s, m = tr._dis_gen_step(
                hold["s"], frozen, x_a, x_b, mask, mask, z_sem, z_sem, lr0,
                False, synth=False, has_sem_gt=False)
            hold["s"] = s
            return m

        def gen_fn():
            s, m = tr._gen_step(
                hold["s"], frozen, x_a, x_b, mask, mask, z_sem, z_sem, lr0,
                False, synth=False, has_sem_gt=False)
            hold["s"] = s
            return m

        d = timeit(f"K={K} dis-only step", dis_fn)
        if K == 1 and tr.fused:
            g = timeit(f"K={K} FUSED dis+gen step", fused_fn)
            cycle = 4 * d + g
        else:
            g = timeit(f"K={K} gen step (unfused)", gen_fn)
            cycle = 4 * d + d + g
        results[K] = (d, g, cycle)
        print(f"K={K}: cycle(5 iters) {cycle * 1e3:.1f} ms -> "
              f"{5 * BATCH / cycle:.2f} img/s", flush=True)

    print("\nsummary:")
    for K, (d, g, cycle) in results.items():
        print(f"  K={K}: dis {d * 1e3:7.2f} ms  gen {g * 1e3:7.2f} ms  "
              f"cycle {cycle * 1e3:8.1f} ms  {5 * BATCH / cycle:7.2f} img/s")


if __name__ == "__main__":
    main()
