"""translate_batch CLI: multi-style outputs written; batched decode matches
per-style decodes (the functional AdaIN makes per-sample styles native)."""

import os

import numpy as np
import torch
import yaml
from PIL import Image

import jax
import jax.numpy as jnp

from tests import torch_mirror as tm


def test_translate_batch_cli(tmp_path):
    p = tm.small_gen_params()
    conf = {
        "new_size": 32, "new_size_a": 32,
        "crop_image_height": 32, "crop_image_width": 32,
        "gen_state": 1, "guided": 1,
        "gen": dict(p), "dis": dict(tm.small_dis_params()),
    }
    cpath = tmp_path / "c.yaml"
    cpath.write_text(yaml.safe_dump(conf))

    torch.manual_seed(0)
    tgen = tm.MirrorAdaINGenDouble(3, p)
    ckpt = tmp_path / "gen.pt"
    torch.save({"2": tgen.state_dict()}, ckpt)

    rng = np.random.RandomState(0)
    indir = tmp_path / "in"
    indir.mkdir()
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
            indir / f"x{i}.png")

    from munit_tpu.cli.translate_batch import main
    out = str(tmp_path / "out")
    main(["--config", str(cpath), "--checkpoint", str(ckpt),
          "--input_folder", str(indir), "--output_folder", out,
          "--num_style", "3", "--output_only", "--seed", "5"])
    for j in range(3):
        files = sorted(os.listdir(f"{out}_{j:02d}"))
        assert files == ["x0.png", "x1.png"]

    # --mesh auto on the fake 8-device backend: num_style=3 pads to 8,
    # shards the decode, and must write byte-equal outputs
    outm = str(tmp_path / "outm")
    main(["--config", str(cpath), "--checkpoint", str(ckpt),
          "--input_folder", str(indir), "--output_folder", outm,
          "--num_style", "3", "--output_only", "--seed", "5",
          "--mesh", "auto"])
    for j in range(3):
        for name in ("x0.png", "x1.png"):
            a = np.asarray(Image.open(f"{out}_{j:02d}/{name}"), np.int16)
            b = np.asarray(Image.open(f"{outm}_{j:02d}/{name}"), np.int16)
            assert np.abs(a - b).max() <= 1


def test_batched_multi_style_decode_matches_loop():
    from munit_tpu.config import validate
    from munit_tpu.train import GenBundle
    p = tm.small_gen_params()
    conf = validate({"gen_state": 1, "gen": p,
                     "new_size": 32, "crop_image_height": 32,
                     "crop_image_width": 32})
    gen = GenBundle(conf)

    def touch(mdl, x):
        c1, s = mdl.encode(x, 1)
        c2, _ = mdl.encode(x, 2)
        return mdl.decode(c1, s, 1), mdl.decode(c2, s, 2)

    params = gen.module.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)), method=touch)["params"]
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    styles = jnp.asarray(rng.randn(3, p["style_dim"]).astype(np.float32))

    c, _ = gen.encode(params, x, 2)
    batched = gen.decode(params, jnp.repeat(c, 3, axis=0), styles, 2)
    for j in range(3):
        single = gen.decode(params, c, styles[j:j + 1], 2)
        np.testing.assert_allclose(np.asarray(batched[j]),
                                   np.asarray(single[0]), rtol=1e-4,
                                   atol=1e-5)
