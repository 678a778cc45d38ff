"""TPU smoke of the configs/final_test ablation grid at production shapes.

Runs every grid flavor (the paper's Baseline / FeatureDA / Output_DA x +-seg
matrix, reference configs/Final_test/*.yaml) for a few dozen REAL iterations
on the chip at its shipped architecture (dim 64) and 256² crops, driving the
exact train-loop cadence: fused dis+gen steps, the synthetic-pair update
with semantic GT (train.py:229-283), sr feature-classifier updates
(FeatureDA), output sim/real discriminators (Output_DA), and — via the
`seghead` pseudo-flavor (sem_seg_lambda=1 override; no shipped grid config
enables it, trainer.py:1286-1324 is config-driven) — the segmentation-head
update. Device-resident batches (loader throughput is measured elsewhere);
asserts every loss finite and reports img/s per flavor.

    python tools/ablation_smoke.py            # all flavors
    python tools/ablation_smoke.py Baseline Output_DA+seg seghead
"""

import os
import sys
import time

os.environ.setdefault("MUNIT_PALLAS", "0")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("SMOKE_BATCH", "8"))
CROP = int(os.environ.get("SMOKE_CROP", "256"))
WARM = 3
ITERS = int(os.environ.get("SMOKE_ITERS", "30"))

ALL = ["Baseline", "Baseline+seg", "FeatureDA", "FeatureDA+seg",
       "FeatureDA+height30_seg", "Output_DA", "Output_DA+seg", "seghead"]


def run_flavor(name):
    import jax
    import jax.numpy as jnp
    # Persistent compile cache: the per-flavor fused graphs cost 305-511 s
    # cold (BENCH.md r4) — share them with cli/train's cache so soaked
    # flavors hit and re-rows are minutes, not an hour.
    os.makedirs(os.path.join(REPO, ".jax_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.config import get_config, validate
    from munit_tpu.core import ops
    from munit_tpu.train import MUNITTrainer

    base = "seghead" if name == "seghead" else name
    conf = get_config(os.path.join(
        REPO, "configs", "final_test",
        ("FeatureDA+seg" if name == "seghead" else name) + ".yaml"))
    if name == "seghead":
        conf["adaptation"]["sem_seg_lambda"] = 1
    conf.update({"batch_size": BATCH, "new_size": CROP,
                 "crop_image_height": CROP, "crop_image_width": CROP})
    conf = validate(conf)
    ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)

    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))

    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.randn(BATCH, CROP, CROP, 3), jnp.bfloat16)
    x_a, x_b, x_as, x_bs = mk(), mk(), mk(), mk()
    mask = jnp.asarray((rng.rand(BATCH, CROP, CROP, 1) > 0.5), jnp.float32)
    sem = jnp.asarray(rng.randint(0, 9, (BATCH, CROP, CROP)), jnp.int32)
    ad = conf["adaptation"]
    use_gt = conf.get("synthetic_seg_gt", 0) == 1

    def one_iter(it):
        tr.iterations = it
        gen_iter = (it + 1) % conf["ratio_disc_gen"] == 0
        if gen_iter and tr.fused:
            m = dict(tr.dis_gen_update(x_a, x_b, mask, mask))
        else:
            m = dict(tr.dis_update(x_a, x_b))
            if gen_iter:
                m.update(tr.gen_update(x_a, x_b, mask, mask))
        if conf["domain_adv_w"] > 0:
            m.update(tr.domain_classifier_update(x_a, x_b))
        if tr.use_classifier_sr and (it + 1) % ad["classif_frequency"] == 0:
            m.update(tr.domain_classifier_sr_update(
                x_a, x_b, domain_synth=False, lamb=ad["dfeat_lambda"]))
        if tr.use_output_classifier_sr and \
                (it + 1) % ad["output_classif_freq"] == 0:
            m.update(tr.output_domain_classifier_sr_update(
                x_a, x_as, x_b, x_bs))
        if conf["synthetic_frequency"] > 0 and \
                it % conf["synthetic_frequency"] == 0:
            gt = (sem, sem) if use_gt else (None, None)
            if tr.fused:
                m.update(tr.dis_gen_update(x_as, x_bs, mask, mask,
                                           synth=True, sem_gt_a=gt[0],
                                           sem_gt_b=gt[1]))
            else:
                m.update(tr.dis_update(x_as, x_bs))
                m.update(tr.gen_update(x_as, x_bs, mask, mask, synth=True,
                                       sem_gt_a=gt[0], sem_gt_b=gt[1]))
            if tr.use_classifier_sr and \
                    (it + 1) % ad["classif_frequency"] == 0:
                m.update(tr.domain_classifier_sr_update(
                    x_as, x_bs, domain_synth=True,
                    lamb=ad["dfeat_lambda"]))
        if tr.train_seg:
            m.update(tr.segmentation_head_update(x_as, x_bs, sem, sem))
        return m

    t0 = time.time()
    m = one_iter(0)
    float(list(m.values())[0])
    m = one_iter(conf["ratio_disc_gen"] - 1)
    float(list(m.values())[0])
    compile_s = time.time() - t0

    for it in range(WARM):
        m = one_iter(it)
    float(list(m.values())[0])
    t0 = time.time()
    seen = {}
    for it in range(WARM, WARM + ITERS):
        m = one_iter(it)
        seen.update(m)
    float(list(m.values())[0])
    dt = time.time() - t0

    bad = [k for k, v in seen.items()
           if not np.all(np.isfinite(np.asarray(v)))]
    # images consumed per iteration: real batch + synthetic batch
    per_iter = BATCH * (2 if conf["synthetic_frequency"] > 0 else 1)
    ips = per_iter * ITERS / dt
    flags = []
    if tr.use_classifier_sr:
        flags.append("featDA")
    if tr.use_output_classifier_sr:
        flags.append("outDA")
    if use_gt:
        flags.append("segGT")
    if tr.train_seg:
        flags.append("segHead")
    status = "ALL FINITE" if not bad else f"NON-FINITE: {bad}"
    print(f"{name:24s} {ITERS} iters  {ips:7.1f} img/s  "
          f"compile {compile_s:5.1f}s  [{','.join(flags) or 'base'}]  "
          f"{status}", flush=True)
    return not bad


def main():
    names = sys.argv[1:] or ALL
    print(f"ablation smoke @ {CROP}² batch {BATCH} ({ITERS} iters/flavor), "
          f"device {__import__('jax').devices()[0]}", flush=True)
    ok = True
    for n in names:
        try:
            ok &= run_flavor(n)
        except Exception as e:  # noqa: BLE001 — transient tunnel drops
            print(f"{n}: attempt 1 failed ({type(e).__name__}: {e}); "
                  "retrying once", flush=True)
            time.sleep(15)
            ok &= run_flavor(n)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
