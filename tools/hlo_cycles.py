"""Per-layer cost attribution of the compiled train steps.

Dumps post-optimization HLO of the production dis and fused dis+gen steps
(cache-hit compile via .jax_cache) and groups `estimated_cycles` backend
metadata by the jax name-scope prefix in op_name metadata — how the r3
pad-backward win and the packed-tail target were found (BENCH.md).

  PYTHONPATH=/root/.axon_site:/root/repo python tools/hlo_cycles.py [depth]
"""

import os
import re
import sys
from collections import defaultdict

import numpy as np


def attribute(text, depth=2):
    # op_name="jit(step)/convert_element_type" metadata=... estimated_cycles
    by = defaultdict(int)
    total = 0
    for m in re.finditer(
            r'op_name="([^"]*)"[^\n]*?"?estimated_cycles["=:\s]+(\d+)', text):
        name, cyc = m.group(1), int(m.group(2))
        parts = [p for p in name.split("/") if not p.startswith("jit(")]
        key = "/".join(parts[:depth]) if parts else "<top>"
        by[key] += cyc
        total += cyc
    if total == 0:
        # alt format: estimated_cycles inside backend_config before op_name
        for m in re.finditer(
                r'estimated_cycles["=:\s]+(\d+)[^\n]*?op_name="([^"]*)"',
                text):
            cyc, name = int(m.group(1)), m.group(2)
            parts = [p for p in name.split("/") if not p.startswith("jit(")]
            key = "/".join(parts[:depth]) if parts else "<top>"
            by[key] += cyc
            total += cyc
    return by, total


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import jax
    import jax.numpy as jnp
    from munit_tpu.config import validate
    from munit_tpu.core import ops
    from munit_tpu.train import MUNITTrainer

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)

    batch, crop = 8, 256
    conf = validate({
        "gen_state": 1, "guided": 1, "semantic_w": 3, "recon_mask": 1,
        "batch_size": batch, "ratio_disc_gen": 5,
        "new_size": crop, "crop_image_height": crop, "crop_image_width": crop,
        "adaptation": {"adv_lambda": 6, "dfeat_lambda": 1,
                       "classif_frequency": 15},
    })
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, crop, crop, 3))))
    rng = np.random.RandomState(0)
    xa = jnp.asarray(rng.randn(batch, crop, crop, 3), jnp.float32)
    xb = jnp.asarray(rng.randn(batch, crop, crop, 3), jnp.float32)
    ma = jnp.ones((batch, crop, crop, 1), jnp.float32)

    zs = jnp.zeros((batch, crop, crop), jnp.int32)
    lr = jnp.float32(1e-4)
    lowers = {
        "dis_step": lambda: tr._dis_step.lower(
            tr.state, xa, xb, lr, True),
        "fused_dis_gen": lambda: tr._dis_gen_step.lower(
            tr.state, tr.frozen, xa, xb, ma, ma, zs, zs, lr, True,
            synth=False, has_sem_gt=True),
    }
    for label, lower in lowers.items():
        text = lower().compile().as_text()
        by, total = attribute(text, depth)
        print(f"\n== {label}: total {total/1e6:.1f} M estimated cycles ==")
        for k, v in sorted(by.items(), key=lambda x: -x[1])[:30]:
            print(f"  {100*v/total:5.1f}%  {v/1e6:9.2f} M  {k}")


if __name__ == "__main__":
    main()
