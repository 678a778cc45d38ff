"""Capture a profiler trace of the train steps on the real chip.

  python tools/profile_step.py [outdir]

Open the trace with tensorboard/xprof. Uses the same workload as bench.py.
"""

import os
import sys

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/munit_trace"
    import jax
    import jax.numpy as jnp
    from munit_tpu.config import validate
    from munit_tpu.core import ops
    from munit_tpu.train import MUNITTrainer
    from munit_tpu.utils import profiling

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)

    batch, crop = 8, 256
    conf = validate({
        "gen_state": 1, "guided": 1, "semantic_w": 3, "recon_mask": 1,
        "batch_size": batch, "ratio_disc_gen": 5,
        "new_size": crop, "crop_image_height": crop, "crop_image_width": crop,
        # match bench.py's TRUE shipped config_256 workload (adaptation block)
        "adaptation": {"adv_lambda": 6, "dfeat_lambda": 1,
                       "classif_frequency": 15},
    })
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, crop, crop, 3))))

    rng = np.random.RandomState(0)
    # bench.py defaults: bf16 activations, fused dis+gen on gen iterations
    x_a = jnp.asarray(rng.randn(batch, crop, crop, 3), jnp.bfloat16)
    x_b = jnp.asarray(rng.randn(batch, crop, crop, 3), jnp.bfloat16)
    mask = jnp.asarray((rng.rand(batch, crop, crop, 1) > 0.5)
                       .astype(np.float32))

    def one_iter(it):
        tr.iterations = it
        if (it + 1) % conf["ratio_disc_gen"] == 0 and tr.fused:
            with profiling.annotate("dis_gen_step"):
                return tr.dis_gen_update(x_a, x_b, mask, mask)
        with profiling.annotate("dis_step"):
            return tr.dis_update(x_a, x_b)

    # warm/compiled
    m = one_iter(0)
    m = one_iter(4)
    float(list(m.values())[0])

    with profiling.trace(outdir):
        for it in range(5):
            m = one_iter(it)
        float(list(m.values())[0])
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main()
