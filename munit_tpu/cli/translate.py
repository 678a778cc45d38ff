"""Single-style folder inference — the production "flood simulator" path
(test.py semantics, /root/reference/scripts/test.py:40-129).

Given a style exemplar (flooded image) and a folder of street-view images:
encode the exemplar's style once with branch 2, then per image encode content
with branch 1, decode with branch 2, save output%03d.jpg.

Weight sources: a reference PyTorch ``gen_*.pt`` ({"2": state_dict}) via the
converter, or a munit_tpu orbax checkpoint. CPU-runnable (BASELINE.json).

Usage:
  python -m munit_tpu.cli.translate --config configs/config_256.yaml \\
      --checkpoint gen.pt --input input_folder/ --style style.png \\
      --output_folder out/
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from munit_tpu.config import get_config
from munit_tpu.data import transforms as T
from munit_tpu.train import GenBundle


def load_gen_params(checkpoint: str, conf):
    """Reference .pt ({"2": sd} dual / {"a","b"} single), orbax dir, or a
    packed bf16 inference .npz (checkpoint_tools pack)."""
    if os.path.isdir(checkpoint):
        from munit_tpu.io.checkpoint import restore_checkpoint
        from munit_tpu.train import MUNITTrainer
        tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
        state, _ = restore_checkpoint(checkpoint, tr.state)
        return state["gen"]
    if checkpoint.endswith(".npz"):
        from munit_tpu.io.checkpoint import load_inference_params
        return load_inference_params(checkpoint)
    from munit_tpu.io import load_torch_checkpoint, convert_gen_state_dict
    blob = load_torch_checkpoint(checkpoint)
    if "2" in blob:
        return jax.tree.map(jnp.asarray,
                            convert_gen_state_dict(blob["2"], conf["gen"],
                                                   dual=True))
    return {k: jax.tree.map(jnp.asarray,
                            convert_gen_state_dict(blob[k], conf["gen"],
                                                   dual=False))
            for k in ("a", "b")}


def load_image(path: str, new_size: int) -> jnp.ndarray:
    img = T.resize_shorter(Image.open(path).convert("RGB"), new_size)
    return jnp.asarray(T.normalize_pm1(T.to_array01(img)))[None]


def save_image01(arr01: np.ndarray, path: str):
    """(H,W,C) [0,1] → jpg with make_grid(normalize=True) min-max semantics."""
    lo, hi = arr01.min(), arr01.max()
    arr = (arr01 - lo) / max(hi - lo, 1e-5)
    Image.fromarray((arr * 255).round().astype(np.uint8)).save(path)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input", required=True, help="input folder (glob input*)")
    p.add_argument("--style", required=True, help="style exemplar image")
    p.add_argument("--output_folder", required=True)
    p.add_argument("--save_input", action="store_true")
    p.add_argument("--seed", type=int, default=10)
    # Drop-in flag compatibility with reference test.py invocations:
    # --synchronized is parsed but unused by the reference's test.py body
    # (test.py:28-32 — it only matters in test_batch.py), and --output_path
    # only pointed at the VGG weight dir (test.py:38-42), which inference
    # never touches. Accepted as no-ops so migrating scripts run unchanged.
    p.add_argument("--synchronized", action="store_true",
                   help="accepted for reference test.py compatibility (no-op)")
    p.add_argument("--output_path", default=".",
                   help="accepted for reference test.py compatibility (no-op)")
    p.add_argument("--quant", choices=["none", "int8"], default="none",
                   help="int8: calibrated-static W8A8 on the MXU-bound "
                        "generator convs (small batch-8 win on current "
                        "XLA, BENCH.md; outputs within ~1%% of bf16)")
    opts = p.parse_args(argv)

    conf = get_config(opts.config)
    os.makedirs(opts.output_folder, exist_ok=True)
    gen = GenBundle(conf)
    params = load_gen_params(opts.checkpoint, conf)
    new_size = conf["new_size"]

    files = sorted(glob.glob(os.path.join(opts.input, "*")))
    if not files:
        raise SystemExit("Image list is empty.")

    from munit_tpu.core import ops
    quant = opts.quant == "int8"

    style = load_image(opts.style, new_size)
    _, s_b = jax.jit(lambda x: gen.encode(params, x, 2))(style)

    def body(x_a):
        c_a, _ = gen.encode(params, x_a, 1)
        return gen.decode(params, c_a, s_b, 2)

    scales = None
    if quant:
        # calibrate per-site activation scales on the first real inputs
        # (static W8A8; dynamic per-dispatch scales measured slower than
        # bf16 e2e — BENCH.md)
        @jax.jit
        def record(x_a):
            rec = []
            with ops.conv_quant(record=rec):
                out = body(x_a)
            return out, jnp.stack(rec)

        mx = None
        for path in files[:8]:
            _, m = record(load_image(path, new_size))
            m = np.asarray(m)
            mx = m if mx is None else np.maximum(mx, m)
        scales = [1.1 * float(v) for v in mx]

    @jax.jit
    def translate(x_a):
        if scales is not None:
            with ops.conv_quant(scales=scales):
                return body(x_a)
        return body(x_a)

    for j, path in enumerate(files):
        x_a = load_image(path, new_size)
        if opts.save_input:
            save_image01(np.asarray((x_a[0] + 1) / 2.0),
                         os.path.join(opts.output_folder, f"input{j:03d}.jpg"))
        x_ab = translate(x_a)
        save_image01(np.asarray((x_ab[0] + 1) / 2.0),
                     os.path.join(opts.output_folder, f"output{j:03d}.jpg"))
    print(f"Wrote {len(files)} translations to {opts.output_folder}")


if __name__ == "__main__":
    main()
