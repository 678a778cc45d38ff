"""Import/export roundtrip: flax params → reference .pt → flax params, and
the torch mirror loads our exported state dict directly."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from munit_tpu.io import convert_gen_state_dict
from munit_tpu.io.torch_import import (export_gen_state_dict,
                                       save_reference_checkpoint,
                                       load_torch_checkpoint)
from munit_tpu.nn import AdaINGenDual

from tests import torch_mirror as tm


def test_export_import_roundtrip(tmp_path):
    p = tm.small_gen_params()
    jgen = AdaINGenDual(input_dim=3, dim=p["dim"], style_dim=p["style_dim"],
                        n_downsample=p["n_downsample"], n_res=p["n_res"],
                        mlp_dim=p["mlp_dim"])
    x = jnp.zeros((1, 32, 32, 3))

    def touch(mdl, x):
        c1, s = mdl.encode(x, 1)
        c2, _ = mdl.encode(x, 2)
        return mdl.decode(c1, s, 1), mdl.decode(c2, s, 2)

    params = jgen.init(jax.random.PRNGKey(0), x, method=touch)["params"]
    ckpt = str(tmp_path / "gen_00000001.pt")
    save_reference_checkpoint(ckpt, params, p, gen_state=1)

    blob = load_torch_checkpoint(ckpt)
    back = convert_gen_state_dict(blob["2"], p, dual=True)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree.map(jnp.asarray, back)))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_b[path]), atol=1e-7,
                                   err_msg=str(path))


def test_torch_mirror_loads_exported_state_dict(tmp_path):
    p = tm.small_gen_params()
    jgen = AdaINGenDual(input_dim=3, dim=p["dim"], style_dim=p["style_dim"],
                        n_downsample=p["n_downsample"], n_res=p["n_res"],
                        mlp_dim=p["mlp_dim"])
    x = jnp.zeros((1, 32, 32, 3))

    def touch(mdl, x):
        c1, s = mdl.encode(x, 1)
        c2, _ = mdl.encode(x, 2)
        return mdl.decode(c1, s, 1), mdl.decode(c2, s, 2)

    params = jgen.init(jax.random.PRNGKey(1), x, method=touch)["params"]
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_gen_state_dict(params, p, dual=True).items()}
    tgen = tm.MirrorAdaINGenDouble(3, p)
    tgen.load_state_dict(sd)  # strict — every key must match

    # forward parity through the loaded mirror
    rng = np.random.RandomState(0)
    xi = rng.randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ct, st = tgen.encode(
            torch.from_numpy(np.transpose(xi, (0, 3, 1, 2)).copy()), 1)
        yt = tgen.decode(ct, st, 1)
    cj, sj = jgen.apply({"params": params}, jnp.asarray(xi), 1, method="encode")
    yj = jgen.apply({"params": params}, cj, sj, 1, method="decode")
    np.testing.assert_allclose(np.asarray(yj),
                               np.transpose(yt.numpy(), (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-3)


def test_dis_export_import_roundtrip():
    from munit_tpu.io.torch_import import export_dis_state_dict
    from munit_tpu.io import convert_dis_state_dict
    from munit_tpu.nn import MsImageDis

    p = tm.small_dis_params()
    jdis = MsImageDis(input_dim=3, n_layer=p["n_layer"], dim=p["dim"],
                      norm=p["norm"], activ=p["activ"],
                      num_scales=p["num_scales"], pad_type=p["pad_type"])
    params = jdis.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    sd = export_dis_state_dict(params, p)
    back = jax.tree.map(jnp.asarray, convert_dis_state_dict(sd, p))
    for a, b in zip(jax.tree_util.tree_leaves_with_path(params),
                    jax.tree_util.tree_leaves_with_path(back)):
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   atol=1e-7, err_msg=str(a[0]))
    # mirror strict-load check
    tdis = tm.MirrorMsImageDis(3, p)
    tdis.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                          for k, v in sd.items()})


def test_legacy_pytorch03_keys_ignored(tmp_path):
    """PyTorch-0.3-era checkpoints carry InstanceNorm running-stat buffers
    that 0.4 rejects; the reference strips them with pytorch03_to_pytorch04
    (utils.py:1130-1216, used at test_batch.py:129). Our converter fetches
    tensors BY NAME, so the stale keys are ignored without a migration pass
    — conversion of a 0.3-style state dict must equal the clean one."""
    p = tm.small_gen_params()
    jgen = AdaINGenDual(input_dim=3, dim=p["dim"], style_dim=p["style_dim"],
                        n_downsample=p["n_downsample"], n_res=p["n_res"],
                        mlp_dim=p["mlp_dim"])
    x = jnp.zeros((1, 32, 32, 3))

    def touch(mdl, x):
        c1, s = mdl.encode(x, 1)
        c2, _ = mdl.encode(x, 2)
        return mdl.decode(c1, s, 1), mdl.decode(c2, s, 2)

    params = jgen.init(jax.random.PRNGKey(2), x, method=touch)["params"]
    ckpt = str(tmp_path / "gen_00000001.pt")
    save_reference_checkpoint(ckpt, params, p, gen_state=1)
    sd = dict(load_torch_checkpoint(ckpt)["2"])

    legacy = dict(sd)
    for k in list(sd):
        # 0.3 serialized running stats for every InstanceNorm module
        if ".norm" in k or "model.0" in k:
            base = k.rsplit(".", 1)[0]
            legacy[base + ".running_mean"] = np.zeros(4, np.float32)
            legacy[base + ".running_var"] = np.ones(4, np.float32)

    a = jax.tree_util.tree_leaves_with_path(
        convert_gen_state_dict(sd, p, dual=True))
    b = dict(jax.tree_util.tree_leaves_with_path(
        convert_gen_state_dict(legacy, p, dual=True)))
    assert len(a) == len(b)
    for path, leaf in a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(b[path]),
                                      err_msg=str(path))
