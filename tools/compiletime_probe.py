"""Probe: where does the bench-step COMPILE time come from?

Lowers (traces — local, cheap) the production bench steps at the shipped
config_256 shapes and reports StableHLO module size / op counts per flag
variant. Compile time on the remote TPU scales with post-optimization
program size; this gives the cheap local proxy before paying minutes-scale
server compiles. Run with MUNIT_* env flags to compare variants:

    python tools/compiletime_probe.py            # shipped defaults
    MUNIT_PACKED_TAIL=0 python tools/compiletime_probe.py
    MUNIT_WIDE=0 python tools/compiletime_probe.py

Optionally COMPILE=1 to also run the real backend compile and time it.
"""

import collections
import os
import re
import sys
import time

os.environ.setdefault("MUNIT_PALLAS", "0")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from munit_tpu.config import validate
from munit_tpu.train import MUNITTrainer

BATCH = int(os.environ.get("PROBE_BATCH", "8"))
CROP = int(os.environ.get("PROBE_CROP", "256"))
COMPILE = os.environ.get("COMPILE", "0") == "1"


def describe(name, lowered):
    txt = lowered.as_text()
    ops = collections.Counter(
        m.group(1) for m in re.finditer(r"= \"?([a-z_.]+)[\"(< ]", txt))
    total = sum(ops.values())
    print(f"{name}: {len(txt) / 1e6:.1f} MB stablehlo, {total} ops; top: "
          + ", ".join(f"{k}={v}" for k, v in ops.most_common(8)))
    return total


def main():
    conf = validate({
        "gen_state": 1, "guided": 1, "semantic_w": 3, "recon_mask": 1,
        "batch_size": BATCH, "ratio_disc_gen": 5,
        "new_size": CROP, "crop_image_height": CROP, "crop_image_width": CROP,
        "adaptation": {"adv_lambda": 6, "dfeat_lambda": 1,
                       "classif_frequency": 15},
    })
    from munit_tpu.core import ops as cops
    cops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0), dtype=jnp.float32)
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))

    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3), jnp.bfloat16)
    x_b = jnp.asarray(rng.randn(BATCH, CROP, CROP, 3), jnp.bfloat16)
    mask = jnp.asarray((rng.rand(BATCH, CROP, CROP, 1) > 0.5),
                       jnp.float32)
    z_sem = jnp.zeros((BATCH, CROP, CROP), jnp.int32)
    lr = jnp.asarray(1e-4, jnp.float32)

    lowerings = {}
    t0 = time.time()
    lowerings["dis"] = tr._dis_step.lower(
        tr.state, x_a, x_b, lr, extrapolate=False)
    lowerings["dis_gen"] = tr._dis_gen_step.lower(
        tr.state, tr.frozen, x_a, x_b, mask, mask, z_sem, z_sem, lr,
        extrapolate=False, synth=False, has_sem_gt=False)
    lowerings["classifier_sr"] = tr._classifier_sr_step.lower(
        tr.state, x_a, x_b, jnp.asarray(1.0), lr,
        extrapolate=False, domain_synth=False)
    print(f"trace time: {time.time() - t0:.1f}s  "
          f"(flags: PACKED_TAIL={os.environ.get('MUNIT_PACKED_TAIL', 'auto')} "
          f"WIDE={tr.wide} FUSED={tr.fused} "
          f"S2D={os.environ.get('MUNIT_S2D', 'auto')})")
    for name, lo in lowerings.items():
        describe(name, lo)

    if COMPILE:
        for name, lo in lowerings.items():
            t0 = time.time()
            c = lo.compile()
            dt = time.time() - t0
            try:
                mem = c.memory_analysis()
                extra = (f", {mem.temp_size_in_bytes / 1e9:.2f} GB temp"
                         if mem else "")
            except Exception:
                extra = ""
            print(f"{name}: compiled in {dt:.1f}s{extra}")


if __name__ == "__main__":
    main()
