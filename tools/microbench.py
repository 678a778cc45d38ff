"""Component-level TPU microbenchmarks for the 256² train workload.

Times each piece of the cadence separately so the throughput budget can be
attributed (dis step vs gen step vs raw subnetwork forwards). Uses the same
numerics as bench.py (bf16 convs + bf16 activations).

  python tools/microbench.py [piece ...]     # default: all

Pieces: dis gen genfwd disfwd seg enc dec
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("MUNIT_PALLAS", "0")

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
CROP = 256
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


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

    conf = validate({
        "gen_state": 1, "guided": 1, "semantic_w": 3, "recon_mask": 1,
        "batch_size": BATCH, "ratio_disc_gen": 5,
        "new_size": CROP, "crop_image_height": CROP, "crop_image_width": CROP,
    })
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))

    rng = np.random.RandomState(0)
    act = jnp.bfloat16
    x_a = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3), act)
    x_b = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3), act)
    mask = jnp.asarray((rng.rand(BATCH, CROP, CROP, 1) > 0.5)
                       .astype(np.float32))

    def timeit(name, fn, sync):
        fn()  # compile
        sync()
        t0 = time.time()
        t_compile = time.time() - t0
        for _ in range(2):
            fn()
        sync()
        t0 = time.time()
        for _ in range(ITERS):
            out = fn()
        sync()
        dt = (time.time() - t0) / ITERS
        print(f"{name:28s} {dt * 1e3:8.2f} ms/call "
              f"({BATCH / dt:7.1f} img/s equiv)", flush=True)
        return dt

    pieces = sys.argv[1:] or ["dis", "gen", "genfwd", "disfwd", "seg",
                              "enc", "dec"]
    results = {}

    if "dis" in pieces:
        def dis():
            tr.iterations = 0
            return tr.dis_update(x_a, x_b)
        results["dis"] = timeit(
            "dis step (full)", dis,
            lambda: float(list(tr.dis_update(x_a, x_b).values())[0]))

    if "gen" in pieces:
        def gen():
            tr.iterations = 4
            return tr.gen_update(x_a, x_b, mask, mask)
        results["gen"] = timeit(
            "gen step (full)", gen,
            lambda: float(list(gen().values())[0]))

    params = jax.device_put(tr.state["gen"])

    if "genfwd" in pieces:
        @jax.jit
        def genfwd(p, xa, xb):
            c_a, s_a = tr.gen.encode(p, xa, 1)
            c_b, s_b = tr.gen.encode(p, xb, 2)
            x_ba = tr.gen.decode(p, c_b, s_a, 1)
            x_ab = tr.gen.decode(p, c_a, s_b, 2)
            return jnp.sum(x_ba.astype(jnp.float32) +
                           x_ab.astype(jnp.float32))
        results["genfwd"] = timeit(
            "gen fwd enc2+dec2 (no grad)", lambda: genfwd(params, x_a, x_b),
            lambda: float(genfwd(params, x_a, x_b)))

    if "disfwd" in pieces:
        dis_params = {"a": tr.state["dis_a"], "b": tr.state["dis_b"]}

        @jax.jit
        def dis_fb(dp, xf, xr):
            from munit_tpu.losses import dis_gan_loss

            def loss(dp):
                la = dis_gan_loss(tr._dis_apply(dp["a"], xf),
                                  tr._dis_apply(dp["a"], xr), "lsgan")
                lb = dis_gan_loss(tr._dis_apply(dp["b"], xr),
                                  tr._dis_apply(dp["b"], xf), "lsgan")
                return la + lb
            l, g = jax.value_and_grad(loss)(dp)
            return l
        results["disfwd"] = timeit(
            "dis fwd+bwd only", lambda: dis_fb(dis_params, x_a, x_b),
            lambda: float(dis_fb(dis_params, x_a, x_b)))

    if "seg" in pieces:
        @jax.jit
        def seg(xa):
            return jnp.sum(tr._segment(xa, tr.frozen).astype(jnp.float32))
        results["seg"] = timeit(
            "segmenter fwd", lambda: seg(x_a), lambda: float(seg(x_a)))

    if "enc" in pieces:
        @jax.jit
        def enc(p, xa):
            c, s = tr.gen.encode(p, xa, 1)
            return jnp.sum(c.astype(jnp.float32)) + jnp.sum(
                s.astype(jnp.float32))
        results["enc"] = timeit(
            "encode fwd (1 domain)", lambda: enc(params, x_a),
            lambda: float(enc(params, x_a)))

    if "dec" in pieces:
        c_a, s_a = jax.jit(lambda p, x: tr.gen.encode(p, x, 1))(params, x_a)

        @jax.jit
        def dec(p, c, s):
            return jnp.sum(tr.gen.decode(p, c, s, 1).astype(jnp.float32))
        results["dec"] = timeit(
            "decode fwd (1 domain)", lambda: dec(params, c_a, s_a),
            lambda: float(dec(params, c_a, s_a)))

    # budget summary for the 5-dis + 1-gen cadence
    if "dis" in results and "gen" in results:
        cadence = 5 * results["dis"] + results["gen"]
        print(f"\ncadence (5 dis + 1 gen): {cadence * 1e3:.1f} ms "
              f"→ {5 * BATCH / cadence:.1f} img/s "
              f"(dis {5 * results['dis'] / cadence:.0%}, "
              f"gen {results['gen'] / cadence:.0%})")


if __name__ == "__main__":
    main()
