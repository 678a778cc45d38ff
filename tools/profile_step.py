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
    })
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, crop, crop, 3))))

    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.randn(batch, crop, crop, 3).astype(np.float32))
    x_b = jnp.asarray(rng.randn(batch, crop, crop, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(batch, crop, crop, 1) > 0.5)
                       .astype(np.float32))

    # warm/compiled
    tr.iterations = 0
    m = tr.dis_update(x_a, x_b)
    tr.iterations = 4
    m = tr.gen_update(x_a, x_b, mask, mask)
    float(list(m.values())[0])

    with profiling.trace(outdir):
        for it in range(5):
            tr.iterations = it
            with profiling.annotate("dis_step"):
                m = tr.dis_update(x_a, x_b)
            if (it + 1) % 5 == 0:
                with profiling.annotate("gen_step"):
                    m = tr.gen_update(x_a, x_b, mask, mask)
        float(list(m.values())[0])
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main()
