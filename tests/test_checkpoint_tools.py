"""checkpoint_tools CLI: .pt → orbax → .pt round trip."""

import numpy as np
import torch
import yaml

import jax

from tests import torch_mirror as tm


def test_import_export_roundtrip(tmp_path):
    p = tm.small_gen_params()
    conf = {
        "new_size": 32, "crop_image_height": 32, "crop_image_width": 32,
        "gen_state": 1, "guided": 1,
        "gen": dict(p), "dis": dict(tm.small_dis_params()),
    }
    cpath = tmp_path / "c.yaml"
    cpath.write_text(yaml.safe_dump(conf))

    torch.manual_seed(0)
    tgen = tm.MirrorAdaINGenDouble(3, p)
    pt_in = tmp_path / "gen_in.pt"
    torch.save({"2": tgen.state_dict()}, pt_in)

    from munit_tpu.cli.checkpoint_tools import main
    ckpt_dir = str(tmp_path / "orbax")
    main(["import", "--config", str(cpath), "--gen", str(pt_in),
          "--out", ckpt_dir, "--step", "7"])
    pt_out = tmp_path / "gen_out.pt"
    main(["export", "--config", str(cpath), "--ckpt", ckpt_dir,
          "--out", str(pt_out)])

    sd_in = {k: v.numpy() for k, v in torch.load(
        pt_in, weights_only=True)["2"].items()}
    sd_out = {k: v.numpy() for k, v in torch.load(
        pt_out, weights_only=True)["2"].items()}
    assert set(sd_in) == set(sd_out)
    for k in sd_in:
        np.testing.assert_allclose(sd_in[k], sd_out[k], atol=1e-7, err_msg=k)


def test_pack_bf16_inference_artifact(tmp_path):
    """pack: .pt → compact bf16 .npz; loads back through load_gen_params and
    translates within bf16 tolerance of the f32 params at ~half the bytes."""
    import os

    import jax.numpy as jnp

    from munit_tpu.cli.checkpoint_tools import main
    from munit_tpu.cli.translate import load_gen_params
    from munit_tpu.config import validate
    from munit_tpu.train import GenBundle

    p = tm.small_gen_params()
    conf = {
        "new_size": 32, "crop_image_height": 32, "crop_image_width": 32,
        "gen_state": 1, "guided": 1,
        "gen": dict(p), "dis": dict(tm.small_dis_params()),
    }
    cpath = tmp_path / "c.yaml"
    cpath.write_text(yaml.safe_dump(conf))
    torch.manual_seed(0)
    tgen = tm.MirrorAdaINGenDouble(3, p)
    pt_in = tmp_path / "gen_in.pt"
    torch.save({"2": tgen.state_dict()}, pt_in)

    packed = tmp_path / "gen.npz"
    main(["pack", "--config", str(cpath), "--ckpt", str(pt_in),
          "--out", str(packed)])

    vconf = validate(conf)
    params_f32 = load_gen_params(str(pt_in), vconf)
    params_pk = load_gen_params(str(packed), vconf)  # dequantized to f32

    # structure identical; default load is f32 everywhere (compute-ready)
    flat32 = jax.tree_util.tree_leaves_with_path(params_f32)
    treedef32 = jax.tree_util.tree_structure(params_f32)
    assert treedef32 == jax.tree_util.tree_structure(params_pk)
    for (path, l32), lpk in zip(flat32,
                                jax.tree_util.tree_leaves(params_pk)):
        assert lpk.dtype == l32.dtype, path
        if l32.ndim >= 2:  # went through bf16: quantized but close
            d = np.abs(np.asarray(l32) - np.asarray(lpk)).max()
            assert d <= 0.01, (path, d)
        else:  # kept exact
            np.testing.assert_array_equal(np.asarray(l32), np.asarray(lpk))

    # dtype=None keeps the packed bf16 leaves
    from munit_tpu.io.checkpoint import load_inference_params
    raw = load_inference_params(str(packed), dtype=None)
    kinds = {l.dtype for l in jax.tree_util.tree_leaves(raw) if l.ndim >= 2}
    assert kinds == {np.dtype(jnp.bfloat16)}

    # size: quantization actually halves the weight bytes
    f32_bytes = sum(np.asarray(v).nbytes for _, v in flat32)
    assert os.path.getsize(packed) < 0.65 * f32_bytes

    # end-to-end: guided translate with packed params tracks f32 params
    gen = GenBundle(vconf)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    sty = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)

    def run(params):
        c, _ = gen.encode(params, x, 1)
        _, s = gen.encode(params, sty, 2)
        return gen.decode(params, c, s, 2)

    y32 = np.asarray(run(params_f32), np.float32)
    ypk = np.asarray(run(params_pk), np.float32)
    assert np.abs(y32 - ypk).max() < 0.1  # tanh output, bf16 weight noise


def test_pack_int8_inference_artifact(tmp_path):
    """pack --quant int8: 0.25x-f32 artifact; per-channel dequant loads back
    and translates close to the f32 params."""
    import os

    import jax.numpy as jnp

    from munit_tpu.cli.checkpoint_tools import main
    from munit_tpu.cli.translate import load_gen_params
    from munit_tpu.config import validate
    from munit_tpu.train import GenBundle

    p = tm.small_gen_params()
    conf = {
        "new_size": 32, "crop_image_height": 32, "crop_image_width": 32,
        "gen_state": 1, "guided": 1,
        "gen": dict(p), "dis": dict(tm.small_dis_params()),
    }
    cpath = tmp_path / "c.yaml"
    cpath.write_text(yaml.safe_dump(conf))
    torch.manual_seed(0)
    tgen = tm.MirrorAdaINGenDouble(3, p)
    pt_in = tmp_path / "gen_in.pt"
    torch.save({"2": tgen.state_dict()}, pt_in)

    packed = tmp_path / "gen_int8.npz"
    main(["pack", "--config", str(cpath), "--ckpt", str(pt_in),
          "--out", str(packed), "--quant", "int8"])

    vconf = validate(conf)
    params_f32 = load_gen_params(str(pt_in), vconf)
    params_pk = load_gen_params(str(packed), vconf)

    f32_bytes = sum(np.asarray(v).nbytes for v in
                    jax.tree.leaves(params_f32))
    assert os.path.getsize(packed) < 0.4 * f32_bytes

    # per-leaf: dequantized weights within one scale step of the originals
    for a, b in zip(jax.tree.leaves(params_f32), jax.tree.leaves(params_pk)):
        a, b = np.asarray(a), np.asarray(b)
        if a.ndim >= 2:
            red = tuple(range(a.ndim - 1))
            step = np.maximum(np.abs(a).max(axis=red), 1e-8) / 127.0
            assert np.all(np.abs(a - b) <= 0.51 * step + 1e-9)
        else:
            assert np.array_equal(a, b)  # small leaves stored exactly

    gen = GenBundle(vconf)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    sty = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)

    def run(params):
        c, _ = gen.encode(params, x, 1)
        _, s = gen.encode(params, sty, 2)
        return gen.decode(params, c, s, 2)

    y32 = np.asarray(run(params_f32), np.float32)
    ypk = np.asarray(run(params_pk), np.float32)
    assert np.abs(y32 - ypk).mean() < 0.05
