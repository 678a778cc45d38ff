"""End-to-end pixel parity: flax models + converted weights vs torch mirror.

The torch mirror (tests/torch_mirror.py) reproduces the reference architecture
and state_dict layout; converting its weights through
munit_tpu.io.torch_import and comparing forwards validates every generator /
discriminator op and the converter at once (SURVEY.md §7 step 3).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from munit_tpu.io import convert_gen_state_dict, convert_dis_state_dict
from munit_tpu.nn import AdaINGen, AdaINGenDual, MsImageDis

from tests import torch_mirror as tm


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def make_dual():
    torch.manual_seed(0)
    p = tm.small_gen_params()
    tgen = tm.MirrorAdaINGenDouble(3, p).eval()
    jgen = AdaINGenDual(input_dim=3, dim=p["dim"], style_dim=p["style_dim"],
                        n_downsample=p["n_downsample"], n_res=p["n_res"],
                        mlp_dim=p["mlp_dim"], activ=p["activ"],
                        pad_type=p["pad_type"])
    params = jax.tree.map(jnp.asarray,
                          convert_gen_state_dict(sd_numpy(tgen), p, dual=True))
    return tgen, jgen, {"params": params}, p


def test_dual_gen_encode_decode_parity():
    tgen, jgen, variables, p = make_dual()
    rng = np.random.RandomState(1)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    for domain in (1, 2):
        with torch.no_grad():
            ct, st = tgen.encode(xt, domain)
            yt = tgen.decode(ct, st, domain)
        cj, sj = jgen.apply(variables, jnp.asarray(x), domain, method="encode")
        yj = jgen.apply(variables, cj, sj, domain, method="decode")

        np.testing.assert_allclose(
            np.asarray(sj), st.numpy().reshape(st.shape[0], -1),
            rtol=1e-4, atol=1e-4, err_msg=f"style domain {domain}")
        np.testing.assert_allclose(
            np.asarray(cj), np.transpose(ct.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=1e-4, err_msg=f"content domain {domain}")
        np.testing.assert_allclose(
            np.asarray(yj), np.transpose(yt.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=1e-3, err_msg=f"image domain {domain}")


def test_dual_gen_cross_decode_parity():
    # The production path (test.py:96-120): content from domain 1, style from
    # a domain-2 exemplar, decode with branch 2.
    tgen, jgen, variables, p = make_dual()
    rng = np.random.RandomState(2)
    xa = rng.randn(1, 64, 64, 3).astype(np.float32)
    xb = rng.randn(1, 64, 64, 3).astype(np.float32)
    xat = torch.from_numpy(np.transpose(xa, (0, 3, 1, 2)).copy())
    xbt = torch.from_numpy(np.transpose(xb, (0, 3, 1, 2)).copy())

    with torch.no_grad():
        ca, _ = tgen.encode(xat, 1)
        _, sb = tgen.encode(xbt, 2)
        yt = tgen.decode(ca, sb, 2)

    ca_j, _ = jgen.apply(variables, jnp.asarray(xa), 1, method="encode")
    _, sb_j = jgen.apply(variables, jnp.asarray(xb), 2, method="encode")
    yj = jgen.apply(variables, ca_j, sb_j, 2, method="decode")

    np.testing.assert_allclose(
        np.asarray(yj), np.transpose(yt.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-3)


def test_single_gen_parity():
    torch.manual_seed(3)
    p = tm.small_gen_params()
    tgen = tm.MirrorAdaINGen(3, p).eval()
    jgen = AdaINGen(input_dim=3, dim=p["dim"], style_dim=p["style_dim"],
                    n_downsample=p["n_downsample"], n_res=p["n_res"],
                    mlp_dim=p["mlp_dim"], activ=p["activ"],
                    pad_type=p["pad_type"])
    variables = {"params": jax.tree.map(
        jnp.asarray, convert_gen_state_dict(sd_numpy(tgen), p, dual=False))}

    rng = np.random.RandomState(4)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        ct, st = tgen.encode(xt)
        yt = tgen.decode(ct, st)
    cj, sj = jgen.apply(variables, jnp.asarray(x), method="encode")
    yj = jgen.apply(variables, cj, sj, method="decode")
    np.testing.assert_allclose(
        np.asarray(yj), np.transpose(yt.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-3)


def test_discriminator_parity():
    torch.manual_seed(5)
    p = tm.small_dis_params()
    tdis = tm.MirrorMsImageDis(3, p).eval()
    jdis = MsImageDis(input_dim=3, n_layer=p["n_layer"], dim=p["dim"],
                      norm=p["norm"], activ=p["activ"],
                      num_scales=p["num_scales"], pad_type=p["pad_type"])
    variables = {"params": jax.tree.map(
        jnp.asarray, convert_dis_state_dict(sd_numpy(tdis), p))}

    rng = np.random.RandomState(6)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        wants = tdis(xt)
    gots = jdis.apply(variables, jnp.asarray(x))
    assert len(gots) == p["num_scales"]
    for got, want in zip(gots, wants):
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=1e-4)


def test_full_size_shapes_and_jit():
    # config_256 shapes (SURVEY.md §3.4) compile under jit and match the trace.
    p = tm.GEN_PARAMS
    jgen = AdaINGenDual(input_dim=3, dim=p["dim"], style_dim=p["style_dim"],
                        n_downsample=p["n_downsample"], n_res=p["n_res"],
                        mlp_dim=p["mlp_dim"])
    x = jnp.zeros((1, 256, 256, 3))
    variables = jax.eval_shape(lambda: jgen.init(jax.random.PRNGKey(0), x, 1))
    c, s = jax.eval_shape(
        lambda v: jgen.apply(v, x, 1, method="encode"), variables)
    assert c.shape == (1, 64, 64, 256)
    assert s.shape == (1, 16)

    jdis = MsImageDis(input_dim=3)
    dv = jax.eval_shape(lambda: jdis.init(jax.random.PRNGKey(0), x))
    outs = jax.eval_shape(lambda v: jdis.apply(v, x), dv)
    assert [o.shape for o in outs] == [(1, 16, 16, 1), (1, 8, 8, 1), (1, 4, 4, 1)]


def test_hd_shapes():
    # config_HD: 512² crops (configs/config_HD.yaml) — abstract-shape check
    p = tm.GEN_PARAMS
    jgen = AdaINGenDual(input_dim=3, dim=p["dim"], style_dim=p["style_dim"],
                        n_downsample=p["n_downsample"], n_res=p["n_res"],
                        mlp_dim=p["mlp_dim"])
    x = jnp.zeros((1, 512, 512, 3))
    variables = jax.eval_shape(lambda: jgen.init(jax.random.PRNGKey(0), x, 1))
    c, s = jax.eval_shape(
        lambda v: jgen.apply(v, x, 1, method="encode"), variables)
    assert c.shape == (1, 128, 128, 256)
    y = jax.eval_shape(
        lambda v, c, s: jgen.apply(v, c, s, 1, method="decode"),
        variables, c, s)
    assert y.shape == (1, 512, 512, 3)
