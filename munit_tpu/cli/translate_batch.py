"""Multi-style batch inference + IS/CIS (test_batch.py semantics,
/root/reference/scripts/test_batch.py:100-208).

Per input image: encode content, decode with ``num_style`` random (or fixed
"synchronized") style codes, write each to output_folder_%02d/<basename>.
Optionally accumulate fine-tuned-Inception softmax predictions for IS/CIS.

The reference's broken ``UNIT_Trainer`` import (test_batch.py:12) is fixed by
construction; both gen_state layouts load.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from munit_tpu.config import get_config
from munit_tpu.data import ImageFolder
from munit_tpu.cli.translate import load_gen_params, save_image01
from munit_tpu.train import GenBundle


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input_folder", required=True)
    p.add_argument("--output_folder", required=True)
    p.add_argument("--num_style", type=int, default=10)
    p.add_argument("--a2b", type=int, default=1)
    p.add_argument("--synchronized", action="store_true")
    p.add_argument("--output_only", action="store_true")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--compute_IS", action="store_true")
    p.add_argument("--compute_CIS", action="store_true")
    p.add_argument("--trainer", default="MUNIT", choices=["MUNIT", "UNIT"])
    p.add_argument("--inception_ckpt", default=None,
                   help="pickle/torch .pt with fine-tuned InceptionV3 weights")
    # reference flag compatibility (test_batch.py:73-85, :96-102): one
    # inception per target domain, selected by direction
    p.add_argument("--inception_a", default=None,
                   help="per-domain inception (used when --a2b 0); "
                        "reference-compatible alias for --inception_ckpt")
    p.add_argument("--inception_b", default=None,
                   help="per-domain inception (used when --a2b 1)")
    p.add_argument("--mesh", choices=["off", "auto"], default="off",
                   help="auto: shard the num_style-wide decode over all "
                        "visible chips (data-parallel batch inference)")
    opts = p.parse_args(argv)
    if opts.inception_ckpt is None:
        # reference semantics: IS/CIS measure the TARGET domain, so a2b=1
        # scores with domain B's inception (test_batch.py:98-102)
        opts.inception_ckpt = opts.inception_b if opts.a2b \
            else opts.inception_a

    conf = get_config(opts.config)
    style_dim = conf["gen"]["style_dim"]
    new_size = conf.get("new_size_a", conf["new_size"])

    if opts.trainer == "UNIT":
        # UNIT semantics (test_batch.py:210-234): single deterministic decode,
        # no style codes. The reference's UNIT path was broken (its
        # UNIT_Trainer import doesn't exist); this one loads VAEGen weights.
        from munit_tpu.io import load_torch_checkpoint
        from munit_tpu.io.torch_import import convert_vae_gen_state_dict
        from munit_tpu.nn import VAEGen
        g = conf["gen"]
        vae = VAEGen(input_dim=conf["input_dim_a"], dim=g["dim"],
                     n_downsample=g["n_downsample"], n_res=g["n_res"],
                     activ=g["activ"], pad_type=g["pad_type"])
        blob = load_torch_checkpoint(opts.checkpoint)
        slot = "a" if opts.a2b else "b"
        dec_slot = "b" if opts.a2b else "a"
        enc_params = jax.tree.map(
            jnp.asarray, convert_vae_gen_state_dict(blob[slot], g))
        dec_params = jax.tree.map(
            jnp.asarray, convert_vae_gen_state_dict(blob[dec_slot], g))
        opts.num_style = 1

        @jax.jit
        def translate(x, styles):
            hid = vae.apply({"params": enc_params}, x,
                            jax.random.PRNGKey(0), method="encode")[0]
            return vae.apply({"params": dec_params}, hid, method="decode")
    else:
        gen = GenBundle(conf)
        params = load_gen_params(opts.checkpoint, conf)
        enc_dom, dec_dom = (1, 2) if opts.a2b else (2, 1)

        # --mesh auto: the num_style-wide decode is an independent batch —
        # shard it over a (data,) mesh (params replicated, content encode
        # replicated, per-style decodes split across chips).
        mesh = None
        n_dev = 1
        if opts.mesh == "auto" and len(jax.devices()) > 1:
            from munit_tpu.dist import mesh as M
            mesh = M.make_mesh()
            n_dev = mesh.shape["data"]
            params = jax.device_put(params, M.replicated(mesh))

        def _translate(x, styles):
            # one batched decode over all styles (the reference loops per
            # style at batch 1, test_batch.py:162-164)
            c, _ = gen.encode(params, x, enc_dom)
            c_rep = jnp.repeat(c, styles.shape[0], axis=0)
            return gen.decode(params, c_rep, styles, dec_dom)

        if mesh is not None:
            from munit_tpu.dist import mesh as M
            translate_j = jax.jit(
                _translate,
                in_shardings=(M.replicated(mesh), M.data_sharding(mesh)),
                out_shardings=M.data_sharding(mesh))
        else:
            translate_j = jax.jit(_translate)

        def translate(x, styles):
            s = styles.shape[0]
            pad = (-s) % n_dev
            if pad:
                styles = jnp.concatenate(
                    [styles, jnp.repeat(styles[-1:], pad, axis=0)], axis=0)
            if mesh is not None:
                from munit_tpu.dist import mesh as M
                x = jax.device_put(x, M.replicated(mesh))
                styles = jax.device_put(styles, M.data_sharding(mesh))
            y = translate_j(x, styles)
            return y[:s] if pad else y

    inception_apply = None
    if opts.compute_IS or opts.compute_CIS:
        from munit_tpu.eval.inception import (
            InceptionV3, inception_preprocess, convert_inception_state_dict)
        if opts.inception_ckpt is None:
            raise SystemExit("--compute_IS/CIS needs --inception_ckpt")
        if opts.inception_ckpt.endswith((".pt", ".pth")):
            import torch
            sd = {k: v.numpy() for k, v in torch.load(
                opts.inception_ckpt, map_location="cpu",
                weights_only=True).items()}
            variables = jax.tree.map(jnp.asarray,
                                     convert_inception_state_dict(sd))
        else:
            import pickle
            with open(opts.inception_ckpt, "rb") as f:
                variables = pickle.load(f)
        net = InceptionV3()

        @jax.jit
        def inception_apply(img01):
            _, logits = net.apply(variables,
                                  inception_preprocess(img01 * 2.0 - 1.0))
            return jax.nn.softmax(logits, axis=-1)

    dataset = ImageFolder(opts.input_folder, new_size, new_size, new_size,
                          train=False, crop=False, return_paths=True)
    rng = jax.random.PRNGKey(opts.seed)
    rng, kf = jax.random.split(rng)
    style_fixed = jax.random.normal(kf, (opts.num_style, style_dim))

    all_preds, per_image_preds = [], []
    for i in range(len(dataset)):
        sample = dataset.get(i, np.random.default_rng(0))
        x = jnp.asarray(sample["image"])[None]
        if opts.synchronized:
            styles = style_fixed
        else:
            rng, k = jax.random.split(rng)
            styles = jax.random.normal(k, (opts.num_style, style_dim))
        outs01 = (translate(x, styles) + 1.0) / 2.0
        if inception_apply is not None:
            preds = np.asarray(inception_apply(outs01))
            all_preds.append(preds)
            per_image_preds.append(preds)
        basename = os.path.basename(sample["path"])
        for j in range(opts.num_style):
            outdir = f"{opts.output_folder}_{j:02d}"
            os.makedirs(outdir, exist_ok=True)
            save_image01(np.asarray(outs01[j]), os.path.join(outdir, basename))
        if not opts.output_only:
            os.makedirs(opts.output_folder, exist_ok=True)
            save_image01(np.asarray((x[0] + 1) / 2.0),
                         os.path.join(opts.output_folder, f"input{i:03d}.jpg"))

    if opts.compute_IS and all_preds:
        from munit_tpu.eval.scores import inception_score
        print("Inception Score: {}".format(
            inception_score(np.concatenate(all_preds, 0))))
    if opts.compute_CIS and per_image_preds:
        from munit_tpu.eval.scores import conditional_inception_score
        print("conditional Inception Score: {}".format(
            conditional_inception_score(np.stack(per_image_preds))))


if __name__ == "__main__":
    main()
