"""Evaluation CLI: FID against precomputed real moments + slerp style sweeps.

FID wires the reference's dead training-loop hook (train.py:119-130 prepared
metrics but never invoked them — SURVEY.md §2.6) into a working command:

  python -m munit_tpu.cli.evaluate fid --config ... --checkpoint gen.pt \\
      --inception_ckpt inception.pkl [--kid]

``--kid`` additionally reports the Kernel Inception Distance (unbiased
polynomial-kernel MMD², eval/kid.py) against the raw real features that
cli.compute_moments stores alongside mu/sigma — completing the project
metric study's IS/FID/KID set (docs/index.html:338, arXiv:1910.10143).

Slerp sweep (utils.py:849-883 semantics): decode a content image under
spherically-interpolated style codes, write a sweep strip:

  python -m munit_tpu.cli.evaluate sweep --config ... --checkpoint gen.pt \\
      --input img.jpg --nb_interp 8
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp

from munit_tpu.cli.translate import load_gen_params, load_image, save_image01
from munit_tpu.config import get_config
from munit_tpu.train import GenBundle


def cmd_fid(opts):
    conf = get_config(opts.config)
    from munit_tpu.data import get_fid_data_loader
    from munit_tpu.eval.fid import compute_fid_from_pools
    from munit_tpu.eval.inception import InceptionV3, inception_preprocess

    gen = GenBundle(conf)
    params = load_gen_params(opts.checkpoint, conf)

    with open(opts.inception_ckpt, "rb") as f:
        variables = pickle.load(f)
    net = InceptionV3()

    # --mesh auto: shard the translate+inception pipeline over a (data,)
    # mesh — params/inception replicated, image batches split across chips.
    mesh = None
    n_dev = 1
    if getattr(opts, "mesh", "off") == "auto" and len(jax.devices()) > 1:
        from munit_tpu.dist import mesh as M
        mesh = M.make_mesh()
        n_dev = mesh.shape["data"]
        params = jax.device_put(params, M.replicated(mesh))
        variables = jax.device_put(variables, M.replicated(mesh))

    def _fid_step(x_a, x_b):
        """translate + inception pool in ONE dispatch."""
        c_a, _ = gen.encode(params, x_a, 1)
        _, s_b = gen.encode(params, x_b, 2)
        fake = gen.decode(params, c_a, s_b, 2)
        pool, _ = net.apply(variables, inception_preprocess(fake))
        return pool

    if mesh is not None:
        from munit_tpu.dist import mesh as M
        ds = M.data_sharding(mesh)
        fid_step = jax.jit(_fid_step, in_shardings=(ds, ds),
                           out_shardings=ds)
    else:
        fid_step = jax.jit(_fid_step)

    def pooled_batches(batches):
        """Pad each batch to a device multiple for the sharded step; slice
        the per-image pool rows back so pads never enter the FID pool."""
        for batch in batches:
            x_a = jnp.asarray(batch["image_a"])
            x_b = jnp.asarray(batch["image_b"])
            n = x_a.shape[0]
            pad = (-n) % n_dev
            if pad:
                x_a = jnp.concatenate(
                    [x_a, jnp.repeat(x_a[-1:], pad, axis=0)], axis=0)
                x_b = jnp.concatenate(
                    [x_b, jnp.repeat(x_b[-1:], pad, axis=0)], axis=0)
            if mesh is not None:
                from munit_tpu.dist import mesh as M
                x_a = jax.device_put(x_a, M.data_sharding(mesh))
                x_b = jax.device_put(x_b, M.data_sharding(mesh))
            yield np.asarray(fid_step(x_a, x_b))[:n]

    loader = get_fid_data_loader(
        conf["data_list_fid_a"], conf["data_list_fid_b"],
        max(conf["batch_size_fid"], 1), new_size=conf["new_size"],
        num_workers=conf["num_workers"])
    pool = np.concatenate(list(pooled_batches(loader.batches())), axis=0)
    moments = np.load(conf["inception_moment_path"])
    fid = compute_fid_from_pools(pool, moments["mu"], moments["sigma"])
    print(f"FID: {fid}")
    if getattr(opts, "kid", False):
        if "pool" not in moments.files:
            raise SystemExit(
                "--kid needs raw real features: regenerate the moments file "
                "with cli.compute_moments (it now stores `pool` alongside "
                "mu/sigma)")
        from munit_tpu.eval.kid import kid
        kid_mean, kid_std = kid(np.asarray(pool), moments["pool"])
        print(f"KID: {kid_mean:.6f} ± {kid_std:.6f}")
        return {"fid": fid, "kid": kid_mean, "kid_std": kid_std}
    return fid


def cmd_sweep(opts):
    conf = get_config(opts.config)
    from munit_tpu.eval.slerp import get_slerp_interp
    gen = GenBundle(conf)
    params = load_gen_params(opts.checkpoint, conf)
    x = load_image(opts.input, conf["new_size"])
    c, _ = gen.encode(params, x, 1)
    styles = get_slerp_interp(opts.nb_latents, opts.nb_interp,
                              conf["gen"]["style_dim"],
                              np.random.RandomState(opts.seed))
    os.makedirs(opts.output_folder, exist_ok=True)
    decode = jax.jit(lambda s: gen.decode(params, c, s, 2))
    for i, s in enumerate(styles):
        out = decode(jnp.asarray(s)[None])
        save_image01(np.asarray((out[0] + 1) / 2.0),
                     os.path.join(opts.output_folder, f"sweep{i:03d}.jpg"))
    print(f"Wrote {len(styles)} sweep frames to {opts.output_folder}")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    f = sub.add_parser("fid")
    f.add_argument("--config", required=True)
    f.add_argument("--checkpoint", required=True)
    f.add_argument("--inception_ckpt", required=True)
    f.add_argument("--kid", action="store_true",
                   help="also report Kernel Inception Distance (requires a "
                        "moments file carrying the raw real `pool`)")
    f.add_argument("--mesh", choices=["off", "auto"], default="off",
                   help="auto: data-parallel the translate+inception "
                        "pipeline over all visible chips")
    s = sub.add_parser("sweep")
    s.add_argument("--config", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--input", required=True)
    s.add_argument("--output_folder", default="sweep_out")
    s.add_argument("--nb_latents", type=int, default=1)
    s.add_argument("--nb_interp", type=int, default=8)
    s.add_argument("--seed", type=int, default=0)
    opts = p.parse_args(argv)
    if opts.cmd == "fid":
        return cmd_fid(opts)
    return cmd_sweep(opts)


if __name__ == "__main__":
    main()
