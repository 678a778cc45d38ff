"""Checkpoint conversion CLI: reference PyTorch ``.pt`` ⇄ munit_tpu orbax.

  # import: .pt → orbax (full trainer state with fresh optimizers)
  python -m munit_tpu.cli.checkpoint_tools import --config c.yaml \\
      --gen gen_00370000.pt [--dis dis_00370000.pt] --out ckpt_dir --step 370000

  # export: orbax → reference-loadable gen_*.pt
  python -m munit_tpu.cli.checkpoint_tools export --config c.yaml \\
      --ckpt ckpt_dir --out gen_exported.pt
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp


def cmd_import(opts):
    from munit_tpu.config import get_config
    from munit_tpu.io import (load_torch_checkpoint, convert_gen_state_dict,
                              convert_dis_state_dict)
    from munit_tpu.io.checkpoint import save_checkpoint
    from munit_tpu.train import MUNITTrainer

    conf = get_config(opts.config)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    blob = load_torch_checkpoint(opts.gen)
    if conf["gen_state"] == 1:
        tr.state["gen"] = jax.tree.map(
            jnp.asarray, convert_gen_state_dict(blob["2"], conf["gen"], True))
    else:
        tr.state["gen"] = {
            s: jax.tree.map(jnp.asarray,
                            convert_gen_state_dict(blob[s], conf["gen"], False))
            for s in ("a", "b")}
    if opts.dis:
        dblob = load_torch_checkpoint(opts.dis)
        tr.state["dis_a"] = jax.tree.map(
            jnp.asarray, convert_dis_state_dict(dblob["a"], conf["dis"]))
        tr.state["dis_b"] = jax.tree.map(
            jnp.asarray, convert_dis_state_dict(dblob["b"], conf["dis"]))
    save_checkpoint(opts.out, tr.state, step=opts.step)
    print(f"imported → {opts.out} @ step {opts.step}")


def cmd_export(opts):
    from munit_tpu.config import get_config
    from munit_tpu.io.checkpoint import restore_checkpoint
    from munit_tpu.io.torch_import import save_reference_checkpoint
    from munit_tpu.train import MUNITTrainer

    conf = get_config(opts.config)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    state, step = restore_checkpoint(opts.ckpt, tr.state)
    save_reference_checkpoint(opts.out, state["gen"], conf["gen"],
                              gen_state=conf["gen_state"])
    print(f"exported step {step} → {opts.out}")


def cmd_pack(opts):
    """orbax trainer state (or reference .pt) → compact bf16 serving .npz."""
    from munit_tpu.config import get_config
    from munit_tpu.cli.translate import load_gen_params
    from munit_tpu.io.checkpoint import save_inference_params

    conf = get_config(opts.config)
    params = load_gen_params(opts.ckpt, conf)
    save_inference_params(opts.out, params, quant=opts.quant)
    print(f"packed → {opts.out} ({os.path.getsize(opts.out) / 1e6:.1f} MB)")


def cmd_export_aot(opts):
    """Any weight source → AOT deployment artifact (serialized StableHLO).

    The artifact serves guided translation with NO model code or config at
    the destination (munit_tpu/io/aot.py) — the TPU-native answer to the
    reference's serve-by-rebuilding-the-trainer (test.py:55-73).
    """
    from munit_tpu.config import get_config
    from munit_tpu.cli.translate import load_gen_params
    from munit_tpu.core import ops
    from munit_tpu.io import aot
    from munit_tpu.train import GenBundle

    conf = get_config(opts.config)
    gen = GenBundle(conf)
    params = load_gen_params(opts.ckpt, conf)
    if opts.dtype == "bf16":
        # production inference numerics (what bench_infer measures)
        ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)

    quant_scales = None
    if opts.quant == "int8":
        # calibrated-static W8A8 baked into the exported program (the same
        # record pass cli/translate --quant int8 runs at startup; site
        # order is trace order, identical between this body and the export)
        import glob
        import numpy as np
        from munit_tpu.cli.translate import load_image
        if not opts.calib_dir:
            raise SystemExit("--quant int8 needs --calib-dir")
        files = sorted(glob.glob(os.path.join(opts.calib_dir, "*")))[:8]
        if not files:
            raise SystemExit(f"no calibration images in {opts.calib_dir}")
        style = load_image(opts.calib_style or files[0], conf["new_size"])
        s_b = jax.jit(lambda x: gen.encode(params, x, 2)[1])(style)

        @jax.jit
        def record(x, s):
            rec = []
            with ops.conv_quant(record=rec):
                c, _ = gen.encode(params, x, 1)
                out = gen.decode(params, c, s, 2)
            return out, (jnp.stack(rec) if rec else jnp.zeros((0,)))

        mx = None
        for pth in files:
            _, m = record(load_image(pth, conf["new_size"]), s_b)
            m = np.asarray(m)
            mx = m if mx is None else np.maximum(mx, m)
        quant_scales = [1.1 * float(v) for v in mx]
        if not quant_scales:
            print("export-aot: no convs met the int8 shape heuristic at "
                  "this architecture — exporting unquantized")
            quant_scales = None

    platforms = tuple(opts.platforms.split(","))
    aot.save_artifact(opts.out, gen, params, conf["new_size"],
                      conf["gen"]["style_dim"], platforms=platforms,
                      conv_dtype={"bf16": "bfloat16", "f32": "float32"}[
                          opts.dtype],
                      quant_scales=quant_scales)
    print(f"exported AOT artifact → {opts.out} "
          f"({os.path.getsize(opts.out) / 1e6:.1f} MB, "
          f"platforms={','.join(platforms)}, convs={opts.dtype}, "
          f"quant={'int8-static' if quant_scales else 'none'})")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    i = sub.add_parser("import")
    i.add_argument("--config", required=True)
    i.add_argument("--gen", required=True)
    i.add_argument("--dis", default=None)
    i.add_argument("--out", required=True)
    i.add_argument("--step", type=int, default=0)
    e = sub.add_parser("export")
    e.add_argument("--config", required=True)
    e.add_argument("--ckpt", required=True)
    e.add_argument("--out", required=True)
    k = sub.add_parser("pack", help="params-only bf16 serving artifact")
    k.add_argument("--config", required=True)
    k.add_argument("--ckpt", required=True,
                   help="orbax dir, reference .pt, or inference .npz")
    k.add_argument("--out", required=True)
    k.add_argument("--quant", choices=["bf16", "int8"], default="bf16",
                   help="weight storage: bf16 (0.5x f32, lossless on TPU) "
                        "or int8 (0.25x, per-channel scales, ~0.4%% RMS)")
    a = sub.add_parser("export-aot",
                       help="AOT deployment artifact (serialized StableHLO; "
                            "serves with no model code at the destination)")
    a.add_argument("--config", required=True)
    a.add_argument("--ckpt", required=True,
                   help="orbax dir, reference .pt, or inference .npz")
    a.add_argument("--out", required=True, help="output .jexp.zip path")
    a.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated export platforms (default cpu,tpu)")
    a.add_argument("--dtype", choices=["bf16", "f32"], default="bf16",
                   help="conv compute baked into the traced program")
    a.add_argument("--quant", choices=["none", "int8"], default="none",
                   help="int8: bake calibrated-static W8A8 convs into the "
                        "exported translate program (needs --calib-dir)")
    a.add_argument("--calib-dir", default=None,
                   help="folder of real content images for int8 calibration")
    a.add_argument("--calib-style", default=None,
                   help="style exemplar for calibration (default: first "
                        "calibration image)")
    opts = p.parse_args(argv)
    {"import": cmd_import, "export": cmd_export, "pack": cmd_pack,
     "export-aot": cmd_export_aot}[opts.cmd](opts)


if __name__ == "__main__":
    main()
