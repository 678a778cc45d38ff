"""Benchmark: 256x256 MUNIT training throughput (images/sec/chip).

Measures the full shipped config_256.yaml workload (reference
configs/config_256.yaml) on one chip, steady-state:
- dis update every iteration; gen update every ratio_disc_gen=5 with masked
  cycle + semantic loss against the frozen ResNet34-8s segmenter;
- the sim/real feature-classifier fool term in every gen step
  (adaptation.adv_lambda=6 — trainer.py:521-536);
- the sim/real classifier update every adaptation.classif_frequency=15
  iterations (dfeat_lambda=1 — train.py:192-204).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

BENCH_MESH=auto data-parallels the identical per-chip workload over every
visible chip (params replicated, batch sharded, ICI grad reduce — the same
dist/mesh.py path as `train --mesh`); the reported images/sec/chip stays
directly comparable to the 1-chip number, total throughput goes to stderr.

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

# Default the bench to the XLA-only path: Mosaic (Pallas) kernel compiles add
# many minutes to the first remote compile for no measured win yet (BENCH.md).
# Override with MUNIT_PALLAS=1 to A/B the fused kernels.
os.environ.setdefault("MUNIT_PALLAS", "0")

REFERENCE_H100_IMAGES_PER_SEC = 20.0
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
WARMUP = 4
ITERS = int(os.environ.get("BENCH_ITERS", "150"))
CROP = int(os.environ.get("BENCH_CROP", "256"))
# BENCH_TINY=1: shrink the nets so the CI smoke test (tests/test_bench_smoke)
# can execute this whole script on CPU in seconds. Never set on real runs.
TINY = os.environ.get("BENCH_TINY", "0") == "1"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    # Persistent compilation cache: the big dis/gen step graphs compile once
    # (remote compile over the axon tunnel is minutes-scale); subsequent bench
    # runs start in seconds.
    cache = "/root/repo/.jax_cache" if jax.devices()[0].platform != "cpu" \
        else "/root/repo/.jax_cache_cpu"   # test-suite smoke runs
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.config import validate
    from munit_tpu.train import MUNITTrainer

    dev = jax.devices()[0]
    # BENCH_MESH=auto: data-parallel the same workload over every visible
    # chip (params replicated, batch sharded, grads psum'd over ICI by XLA —
    # the dist/mesh.py machinery the train CLI uses). Per-chip batch stays
    # BATCH so the reported images/sec/chip is comparable to the 1-chip run.
    mesh, n_dev = None, 1
    if os.environ.get("BENCH_MESH", "off") == "auto" and jax.device_count() > 1:
        from munit_tpu.dist import make_mesh
        mesh = make_mesh()
        n_dev = mesh.shape["data"]
        log(f"bench: data-parallel over {n_dev} chips (BENCH_MESH=auto), "
            f"global batch {BATCH * n_dev}")
    gbatch = BATCH * n_dev
    spec = {
        "gen_state": 1, "guided": 1, "semantic_w": 3, "recon_mask": 1,
        "batch_size": gbatch, "ratio_disc_gen": 5,
        "new_size": CROP, "crop_image_height": CROP, "crop_image_width": CROP,
        # the shipped adaptation block (configs/config_256.yaml:36-38)
        "adaptation": {"adv_lambda": 6, "dfeat_lambda": 1,
                       "classif_frequency": 15},
    }
    if TINY:
        spec["gen"] = {"dim": 16, "mlp_dim": 32, "style_dim": 8,
                       "activ": "relu", "n_downsample": 2, "n_res": 2,
                       "pad_type": "reflect"}
        spec["dis"] = {"dim": 16, "norm": "none", "activ": "lrelu",
                       "n_layer": 2, "gan_type": "lsgan", "num_scales": 2,
                       "pad_type": "reflect"}
    conf = validate(spec)

    from munit_tpu.core import ops
    if os.environ.get("BENCH_BF16", "1") == "1":
        # production numerics: bf16 MXU multiplies, f32 accumulate/norms
        ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)
    remat_env = os.environ.get("BENCH_REMAT", "")
    remat = {"1": True, "pads": "pads", "hd": "hd"}.get(remat_env, None)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0), dtype=jnp.float32,
                      remat=remat)
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))

    rng = np.random.RandomState(0)
    # bf16 activations by default (production numerics; measured fastest —
    # BENCH.md). BENCH_ACT_BF16=0 for the f32-activation variant.
    act_dtype = jnp.bfloat16 if os.environ.get("BENCH_ACT_BF16", "1") == "1" \
        else jnp.float32
    x_a = rng.randn(gbatch, CROP, CROP, 3)
    x_b = rng.randn(gbatch, CROP, CROP, 3)
    mask = (rng.rand(gbatch, CROP, CROP, 1) > 0.5).astype(np.float32)
    import contextlib
    mesh_ctx = contextlib.nullcontext()
    if mesh is not None:
        from munit_tpu.dist import replicate_state, shard_batch
        tr.state = replicate_state(mesh, tr.state)
        tr.frozen = replicate_state(mesh, tr.frozen)
        b = shard_batch(mesh, {"x_a": np.asarray(x_a, act_dtype),
                               "x_b": np.asarray(x_b, act_dtype),
                               "mask": mask})
        x_a, x_b, mask = b["x_a"], b["x_b"], b["mask"]
        mesh_ctx = mesh
    else:
        x_a = jnp.asarray(x_a, act_dtype)
        x_b = jnp.asarray(x_b, act_dtype)
        mask = jnp.asarray(mask)

    ad = conf["adaptation"]

    def one_iter(it):
        tr.iterations = it
        if (it + 1) % conf["ratio_disc_gen"] == 0 and tr.fused:
            m = tr.dis_gen_update(x_a, x_b, mask, mask)
        else:
            m = tr.dis_update(x_a, x_b)
            if (it + 1) % conf["ratio_disc_gen"] == 0:
                m = tr.gen_update(x_a, x_b, mask, mask)
        # train.py:192-204: sr feature-classifier update every 15 iterations
        if tr.use_classifier_sr and (it + 1) % ad["classif_frequency"] == 0:
            m = dict(m, **tr.domain_classifier_sr_update(
                x_a, x_b, domain_synth=False, lamb=ad["dfeat_lambda"]))
        return m

    def sync(m):
        # block_until_ready is unreliable over the axon tunnel; a scalar fetch
        # is the only dependable barrier.
        return float(list(m.values())[0])

    with mesh_ctx:
        if os.environ.get("BENCH_PARWARM", "1") == "1":
            # Pre-compile all three step graphs CONCURRENTLY: the (remote)
            # backend overlaps compiles (measured wall = max, not sum —
            # BENCH.md r4), and each AOT compile writes the persistent cache
            # entry the jit calls below then load in seconds. Turns a cold
            # cache from sum-of-compiles (~200s) into the longest single
            # compile, which is the difference between fitting the driver's
            # capture budget and rc=124 (the r3 failure mode).
            import threading
            lr0 = jnp.asarray(tr.lr_schedule(0), jnp.float32)
            z_sem = jnp.zeros(x_a.shape[:3], jnp.int32)
            lowers = {
                "dis": lambda: tr._dis_step.lower(
                    tr.state, x_a, x_b, lr0, False),
            }
            if tr.fused:
                lowers["dis_gen"] = lambda: tr._dis_gen_step.lower(
                    tr.state, tr.frozen, x_a, x_b, mask, mask, z_sem, z_sem,
                    lr0, False, synth=False, has_sem_gt=False)
            else:  # unfused path (grad_accum / MUNIT_FUSED=0): gen instead
                lowers["gen"] = lambda: tr._gen_step.lower(
                    tr.state, tr.frozen, x_a, x_b, mask, mask, z_sem, z_sem,
                    lr0, False, synth=False, has_sem_gt=False)
            if tr.use_classifier_sr:
                lowers["classifier_sr"] = lambda: tr._classifier_sr_step.lower(
                    tr.state, x_a, x_b,
                    jnp.asarray(float(ad["dfeat_lambda"]), jnp.float32),
                    lr0, False, domain_synth=False)
            t0 = time.time()

            warm_errors = []

            def warm(name, lower):
                ts = time.time()
                try:
                    lower().compile()
                except Exception as e:  # surface after join — daemon
                    # threads would otherwise swallow the failure and the
                    # jit calls below silently absorb the real compile cost
                    warm_errors.append((name, e))
                    log(f"bench: prewarm {name} FAILED after "
                        f"{time.time() - ts:.1f}s: {e!r}")
                    return
                log(f"bench: prewarm {name} ready in {time.time() - ts:.1f}s")

            threads = [threading.Thread(target=warm, args=kv, daemon=True)
                       for kv in lowers.items()]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            if warm_errors:
                log(f"bench: WARNING {len(warm_errors)} prewarm(s) failed "
                    f"({', '.join(n for n, _ in warm_errors)}) — 'compile' "
                    "timings below include the real compile cost")
            log(f"bench: parallel prewarm done in {time.time() - t0:.1f}s")

        log(f"bench: compiling dis step (batch={BATCH}/chip)...")
        t0 = time.time()
        m = one_iter(0)
        sync(m)
        log(f"bench: dis step ready in {time.time() - t0:.1f}s; "
            "compiling gen step...")
        t0 = time.time()
        m = one_iter(conf["ratio_disc_gen"] - 1)
        sync(m)
        log(f"bench: gen step ready in {time.time() - t0:.1f}s; "
            "compiling classifier_sr step...")
        t0 = time.time()
        m = one_iter(ad["classif_frequency"] - 1)
        sync(m)
        log(f"bench: classifier_sr ready in {time.time() - t0:.1f}s; warmup...")

        for it in range(WARMUP):
            m = one_iter(it)
        sync(m)

        t0 = time.time()
        for it in range(WARMUP, WARMUP + ITERS):
            m = one_iter(it)
        sync(m)
        dt = time.time() - t0
    log(f"bench: {ITERS} iters in {dt:.2f}s")
    if n_dev > 1:
        log(f"bench: total throughput {gbatch * ITERS / dt:.2f} img/s over "
            f"{n_dev} chips")

    images_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "munit_256_train_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / REFERENCE_H100_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # One retry: the remote-TPU tunnel occasionally drops a dispatch;
        # a transient flake must not cost the benchmark capture. The retry
        # reuses the persistent compile cache, so it starts in seconds.
        log(f"bench: attempt 1 failed ({type(e).__name__}: {e}); "
            "retrying once in 20s")
        time.sleep(20)
        main()
