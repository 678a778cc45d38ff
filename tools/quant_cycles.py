"""HLO cycle attribution of the guided-translate inference graph,
bf16 vs calibrated-static int8 — finds where the quantized path loses.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/quant_cycles.py [depth]
"""

import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from hlo_cycles import attribute  # noqa: E402


def opcode_attribute(text):
    by = defaultdict(int)
    for m in re.finditer(
            r'^\s*(?:ROOT )?[%\w.-]+ = \S+ ([a-z-]+)\([^\n]*?'
            r'estimated_cycles["=:\s]+(\d+)', text, re.M):
        by[m.group(1)] += int(m.group(2))
    return by


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

    conf = validate({"gen_state": 1, "guided": 1})
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0), image_size=256)
    gen, params = tr.gen, tr.state["gen"]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 256, 256, 3).astype(np.float32))
    s = jnp.asarray(rng.randn(8, 256, 256, 3).astype(np.float32))

    def body(x_a, style_img):
        c_a, _ = gen.encode(params, x_a, 1)
        _, s_b = gen.encode(params, style_img, 2)
        return gen.decode(params, c_a, s_b, 2)

    @jax.jit
    def record(x_a, style_img):
        rec = []
        with ops.conv_quant(record=rec):
            out = body(x_a, style_img)
        return out, jnp.stack(rec)

    _, mx = record(x, s)
    scales = [1.1 * float(v) for v in np.asarray(mx)]

    def quant_body(x_a, style_img):
        with ops.conv_quant(scales=scales):
            return body(x_a, style_img)

    for name, fn in (("bf16", body), ("int8-static", quant_body)):
        txt = jax.jit(fn).lower(x, s).compile().as_text()
        by, total = attribute(txt, depth)
        print(f"\n=== {name}: total {total/1e6:.1f} M cycles ===")
        for k, v in sorted(by.items(), key=lambda kv: -kv[1])[:14]:
            print(f"  {v/1e6:9.2f} M  {100*v/total:5.1f}%  {k}")
        byop = opcode_attribute(txt)
        tot2 = sum(byop.values()) or 1
        print("  -- by opcode --")
        for k, v in sorted(byop.items(), key=lambda kv: -kv[1])[:10]:
            print(f"  {v/1e6:9.2f} M  {100*v/tot2:5.1f}%  {k}")


if __name__ == "__main__":
    main()
