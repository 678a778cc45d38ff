"""Attribute the fused dis+gen step's time across its phases.

Each phase is jitted in isolation at the bench workload (batch 8, 256²,
bf16) and timed with a scalar-fetch barrier:

  1. semantic pseudo-label targets (frozen segmenter fwd, 2B batch)
  2. generator forward (all 12 sub-net calls of _gen_forward)
  3. generator forward + vjp pullback with unit cotangents  (fwd+bwd bound)
  4. gen loss assembly from a precomputed forward (fwd only)
  5. grad of the loss wrt the forward outputs (dis fwd/bwd + semantic
     remat recompute + loss bwd)
  6. ExtraAdam update of the gen params with unit grads
  7. the real fused step (reference total)

Isolated sums overcount shared work (XLA fuses across phases inside the
real step) but bound where the time sits.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/fusedbench.py
"""

import os
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
    key = jax.random.PRNGKey(7)
    s_a = jax.random.normal(jax.random.fold_in(key, 0),
                            (BATCH, tr.style_dim), x_a.dtype)
    s_b = jax.random.normal(jax.random.fold_in(key, 1),
                            (BATCH, tr.style_dim), x_b.dtype)
    state = tr.state

    def scalar_of(tree):
        leaves = jax.tree.leaves(tree)
        return float(jnp.asarray(leaves[0]).reshape(-1)[0])

    def timeit(name, fn, reps=REPS):
        out = fn()
        scalar_of(out)
        scalar_of(fn())
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        scalar_of(out)
        dt = (time.time() - t0) / reps
        print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    # 1. semantic targets
    sem_fn = jax.jit(lambda xa, xb: tr._semantic_targets(
        xa, xb, None, None, False, tr.frozen))
    timeit("semantic targets (seg fwd, 2B)", lambda: sem_fn(x_a, x_b))

    # 2. gen forward
    fwd_fn = jax.jit(lambda p: tr._gen_forward(p, x_a, x_b, s_a, s_b, True))
    timeit("gen forward (fwd only)", lambda: fwd_fn(state["gen"]))

    # 3. forward + pullback with unit cotangents
    def fwd_bwd(p):
        fw, pullback = jax.vjp(
            lambda q: tr._gen_forward(q, x_a, x_b, s_a, s_b, True), p)
        ct = jax.tree.map(lambda t: jnp.ones_like(t), fw)
        (g,) = pullback(ct)
        return g
    fb_fn = jax.jit(fwd_bwd)
    timeit("gen forward + unit-cotangent pullback", lambda: fb_fn(state["gen"]))

    # 4/5. loss from a precomputed fw: fwd and grad-wrt-fw
    fw0 = fwd_fn(state["gen"])
    sem_t = sem_fn(x_a, x_b)

    def loss_of_fw(fw):
        loss, m = tr._gen_loss_from_fw(
            fw, state, state["dis_a"], state["dis_b"], x_a, x_b, mask, mask,
            s_a, s_b, sem_t[0], sem_t[1], False, False, True, tr.frozen)
        return loss
    loss_fn = jax.jit(loss_of_fw)
    timeit("gen loss assembly (fwd only)", lambda: loss_fn(fw0))
    gloss_fn = jax.jit(jax.grad(loss_of_fw))
    timeit("grad(loss) wrt fw (dis+seg fwd/bwd)", lambda: gloss_fn(fw0))

    # 6. ExtraAdam update with unit grads
    ones_g = jax.tree.map(jnp.ones_like, state["gen"])
    opt_fn = jax.jit(lambda g, o, p: tr._opt_update(
        g, o, p, 1e-4, jnp.asarray(False)))
    timeit("ExtraAdam gen update (unit grads)",
           lambda: opt_fn(ones_g, state["gen_opt"], state["gen"]))

    # 7. real fused step
    def fused():
        tr.iterations = 4
        return tr.dis_gen_update(x_a, x_b, mask, mask)
    timeit("REAL fused dis+gen step", fused)


if __name__ == "__main__":
    main()
