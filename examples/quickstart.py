"""Runnable end-to-end quickstart: toy data → train → translate → artifact.

Generates a synthetic two-domain dataset (domain A: street-view-like
gradient scenes; domain B: the same scenes "flooded" — bottom half water),
writes a small config, trains for a few hundred iterations, translates the
test images with the last checkpoint, and packs an AOT serving artifact.
Mirrors the reference workflow (USAGE.md: prepare lists → train.py →
test.py) on data you can create anywhere — no downloads.

  # CPU smoke (~2-4 min):
  JAX_PLATFORMS=cpu python examples/quickstart.py --outdir /tmp/munit_qs

  # Real TPU run at the shipped 256² scale:
  python examples/quickstart.py --outdir /tmp/munit_qs --size 256 \\
      --dim 64 --iters 10000

Everything the script does maps 1:1 onto the CLIs, so it doubles as living
documentation:
  python -m munit_tpu train / translate / checkpoint_tools export-aot
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import yaml
from PIL import Image

try:
    import munit_tpu  # noqa: F401 — installed, or on PYTHONPATH
except ImportError:  # running straight from a checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def make_scene(rng: np.random.RandomState, size: int) -> np.ndarray:
    """A toy 'street view': sky gradient + ground + a house rectangle."""
    img = np.zeros((size, size, 3), np.float32)
    sky = rng.uniform(0.5, 0.9, 3)
    ground = rng.uniform(0.2, 0.5, 3)
    horizon = int(size * rng.uniform(0.45, 0.6))
    grad = np.linspace(1.0, 0.6, horizon)[:, None, None]
    img[:horizon] = sky * grad
    img[horizon:] = ground
    # house
    w, h = int(size * rng.uniform(0.2, 0.4)), int(size * rng.uniform(0.2, 0.35))
    x0 = rng.randint(0, size - w)
    y0 = horizon - h
    img[max(y0, 0):horizon, x0:x0 + w] = rng.uniform(0.3, 0.8, 3)
    img += rng.randn(size, size, 3).astype(np.float32) * 0.02
    return np.clip(img, 0, 1)


def flood(img: np.ndarray, rng: np.random.RandomState):
    """Domain B: the bottom is water — a blue-tinted vertical reflection."""
    size = img.shape[0]
    level = int(size * rng.uniform(0.6, 0.8))   # always > size/2
    out = img.copy()
    refl = img[2 * level - size:level][::-1]
    water = 0.55 * refl + np.array([0.05, 0.1, 0.25], np.float32)
    out[level:] = water[:size - level] * 0.9 + out[level:] * 0.1
    mask = np.zeros((size, size), np.float32)
    mask[level:] = 1.0
    return np.clip(out, 0, 1), mask


def build_dataset(root: str, n_train: int, n_test: int, size: int, seed=0):
    rng = np.random.RandomState(seed)
    lists = {}
    for split, n in (("train", n_train), ("test", n_test)):
        for dom in "ab":
            os.makedirs(os.path.join(root, f"{split}_{dom}"), exist_ok=True)
        os.makedirs(os.path.join(root, f"{split}_mask"), exist_ok=True)
        pa, pb, pm = [], [], []
        for i in range(n):
            scene = make_scene(rng, size)
            flooded, mask = flood(make_scene(rng, size), rng)
            for arr, dom, acc in ((scene, "a", pa), (flooded, "b", pb)):
                p = os.path.join(root, f"{split}_{dom}", f"{i:04d}.png")
                Image.fromarray((arr * 255).astype(np.uint8)).save(p)
                acc.append(p)
            p = os.path.join(root, f"{split}_mask", f"{i:04d}.png")
            Image.fromarray((mask * 255).astype(np.uint8)).save(p)
            pm.append(p)
        for name, paths in ((f"{split}_a", pa), (f"{split}_b", pb),
                            (f"{split}_mask", pm)):
            lists[name] = os.path.join(root, f"list_{name}.txt")
            with open(lists[name], "w") as f:
                f.write("\n".join(paths) + "\n")
    return lists


def write_config(path: str, lists, size: int, dim: int, iters: int,
                 batch: int):
    conf = {
        # model — the shipped architecture family at a configurable width
        "gen_state": 1, "guided": 1, "recon_mask": 1,
        "gen": {"dim": dim, "mlp_dim": 4 * dim, "style_dim": 8,
                "activ": "relu", "n_downsample": 2, "n_res": 2,
                "pad_type": "reflect"},
        "dis": {"dim": dim, "norm": "none", "activ": "lrelu", "n_layer": 3,
                "gan_type": "lsgan", "num_scales": 2, "pad_type": "reflect"},
        # optimization (reference configs/config_256.yaml values, scaled)
        "max_iter": iters, "batch_size": batch, "ratio_disc_gen": 5,
        "lr": 1e-4, "beta1": 0.5, "beta2": 0.999, "weight_decay": 1e-4,
        "gan_w": 3, "recon_x_w": 12, "recon_s_w": 1, "recon_c_w": 2,
        "recon_x_cyc_w": 12, "semantic_w": 0,
        # data
        "new_size": size, "crop_image_height": size, "crop_image_width": size,
        "num_workers": 2, "display_size": 4,
        "data_folder_train_a": "/", "data_folder_train_b": "/",
        "data_folder_test_a": "/", "data_folder_test_b": "/",
        "data_list_train_a": lists["train_a"],
        "data_list_train_b": lists["train_b"],
        "data_list_test_a": lists["test_a"],
        "data_list_test_b": lists["test_b"],
        "data_list_train_a_mask": lists["train_mask"],
        "data_list_train_b_mask": lists["train_mask"],
        # cadence
        "log_iter": max(1, iters // 20),
        "image_save_iter": max(2, iters // 2),
        "image_display_iter": max(2, iters // 2),
        "snapshot_save_iter": max(2, iters // 2),
    }
    with open(path, "w") as f:
        yaml.safe_dump(conf, f)
    return conf


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", required=True)
    p.add_argument("--size", type=int, default=64, help="image size")
    p.add_argument("--dim", type=int, default=16, help="base channel width")
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--n-train", type=int, default=32)
    p.add_argument("--n-test", type=int, default=4)
    p.add_argument("--platform", choices=["auto", "cpu"], default="auto",
                   help="cpu: force the CPU backend in-process (more robust "
                        "than JAX_PLATFORMS when a site hook pre-registers "
                        "an accelerator)")
    opts = p.parse_args(argv)

    if opts.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(opts.outdir, exist_ok=True)
    data_root = os.path.join(opts.outdir, "data")
    print(f"[1/4] synthesizing toy dataset → {data_root}")
    lists = build_dataset(data_root, opts.n_train, opts.n_test, opts.size)
    cfg = os.path.join(opts.outdir, "quickstart.yaml")
    write_config(cfg, lists, opts.size, opts.dim, opts.iters, opts.batch)

    print(f"[2/4] training {opts.iters} iters (config {cfg})")
    from munit_tpu.cli.train import main as train_main
    train_main(["--config", cfg, "--output_path", opts.outdir])

    run_dir = os.path.join(opts.outdir, "outputs", "quickstart")
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    out_dir = os.path.join(opts.outdir, "translated")
    style = os.path.join(data_root, "test_b", "0000.png")
    print(f"[3/4] translating test_a with style {style} → {out_dir}")
    from munit_tpu.cli.translate import main as translate_main
    translate_main(["--config", cfg, "--checkpoint", ckpt_dir,
                    "--input", os.path.join(data_root, "test_a"),
                    "--style", style, "--output_folder", out_dir,
                    "--save_input"])

    art = os.path.join(opts.outdir, "model.jexp.zip")
    print(f"[4/4] exporting AOT serving artifact → {art}")
    from munit_tpu.cli.checkpoint_tools import main as ck_main
    ck_main(["export-aot", "--config", cfg, "--ckpt", ckpt_dir,
             "--out", art, "--dtype", "f32"])
    print(f"done. metrics: {run_dir}/metrics.jsonl; serve with:\n"
          f"  python -m munit_tpu serve --artifact {art} "
          f"--style {style} --port 8787")


if __name__ == "__main__":
    main()
