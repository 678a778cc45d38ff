"""Precompute Inception pool moments (mu, sigma) of a real-image set.

The reference assumes a precomputed ``inception_moments.npz`` of "900 flooded
images" (configs/config_256.yaml:63-64) but ships no tool to produce it; this
fills that gap:

  python -m munit_tpu.cli.compute_moments --images data/trainB.txt \\
      --inception_ckpt inception.pkl --out data/inception_moments.npz
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True,
                   help="txt list of image paths, or a folder")
    p.add_argument("--inception_ckpt", required=True,
                   help="pickle/torch ckpt of InceptionV3 weights")
    p.add_argument("--out", required=True)
    p.add_argument("--new_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--mesh", choices=["off", "auto"], default="off",
                   help="auto: data-parallel the inception pooling over all "
                        "visible chips")
    opts = p.parse_args(argv)

    from munit_tpu.data.datasets import read_filelist, scan_folder
    from munit_tpu.data import transforms as T
    from munit_tpu.eval.inception import (
        InceptionV3, inception_preprocess, convert_inception_state_dict)
    from PIL import Image

    if os.path.isdir(opts.images):
        paths = scan_folder(opts.images)
    else:
        paths = read_filelist(opts.images)

    if opts.inception_ckpt.endswith((".pt", ".pth")):
        import torch
        sd = {k: v.numpy() for k, v in torch.load(
            opts.inception_ckpt, map_location="cpu",
            weights_only=True).items()}
        variables = jax.tree.map(jnp.asarray,
                                 convert_inception_state_dict(sd))
    else:
        with open(opts.inception_ckpt, "rb") as f:
            variables = pickle.load(f)
    net = InceptionV3()

    # --mesh auto: inception replicated, image batches split across chips
    mesh = None
    n_dev = 1
    if opts.mesh == "auto" and len(jax.devices()) > 1:
        from munit_tpu.dist import mesh as M
        mesh = M.make_mesh()
        n_dev = mesh.shape["data"]
        variables = jax.device_put(variables, M.replicated(mesh))

    def _pool(img_pm1):
        pool, _ = net.apply(variables, inception_preprocess(img_pm1))
        return pool

    if mesh is not None:
        from munit_tpu.dist import mesh as M
        pool_fn = jax.jit(_pool, in_shardings=M.data_sharding(mesh),
                          out_shardings=M.data_sharding(mesh))
    else:
        pool_fn = jax.jit(_pool)

    def run_batch(stack):
        n = stack.shape[0]
        pad = (-n) % n_dev
        if pad:   # pad for the sharded step; slice the rows back (exact)
            stack = np.concatenate(
                [stack, np.repeat(stack[-1:], pad, axis=0)], axis=0)
        x = jnp.asarray(stack)
        if mesh is not None:
            from munit_tpu.dist import mesh as M
            x = jax.device_put(x, M.data_sharding(mesh))
        return np.asarray(pool_fn(x))[:n]

    pools = []
    batch = []
    for path in paths:
        img = T.resize_shorter(Image.open(path).convert("RGB"), opts.new_size)
        # center-crop to a uniform square so batches stack
        w, h = img.size
        s = opts.new_size
        img = T.crop(img, (h - s) // 2, (w - s) // 2, s, s)
        batch.append(T.normalize_pm1(T.to_array01(img)))
        if len(batch) == opts.batch_size:
            pools.append(run_batch(np.stack(batch)))
            batch = []
    if batch:
        pools.append(run_batch(np.stack(batch)))
    pool = np.concatenate(pools, axis=0)

    mu = pool.mean(axis=0)
    sigma = np.cov(pool, rowvar=False)
    # raw pool rides along (f32, ~8 KB/image): `evaluate fid --kid` needs
    # real FEATURES, not just moments, for the unbiased MMD² estimator
    np.savez(opts.out, mu=mu, sigma=sigma, pool=pool.astype(np.float32))
    print(f"Wrote moments (+pool) of {len(pool)} images to {opts.out}")


if __name__ == "__main__":
    main()
