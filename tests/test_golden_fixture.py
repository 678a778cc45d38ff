"""Torch-free golden regression: a fixed mirror checkpoint + input + expected
output are committed as a fixture (tests/fixtures/golden_gen.npz, generated
once from the torch mirror). Future numeric drift in the generator stack —
conv semantics, norms, AdaIN plumbing, converter — fails this test without
needing torch at all."""

import numpy as np

import jax
import jax.numpy as jnp

from munit_tpu.io import convert_gen_state_dict
from munit_tpu.nn import AdaINGenDual

GEN_PARAMS = dict(dim=16, mlp_dim=32, style_dim=8, activ="relu",
                  n_downsample=2, n_res=2, pad_type="reflect")


def test_golden_generator_output():
    blob = np.load("tests/fixtures/golden_gen.npz")
    sd = {k[4:]: blob[k] for k in blob.files if k.startswith("sd::")}
    x, want = blob["x"], blob["y"]

    jgen = AdaINGenDual(input_dim=3, **GEN_PARAMS)
    variables = {"params": jax.tree.map(
        jnp.asarray, convert_gen_state_dict(sd, GEN_PARAMS, dual=True))}
    c, s = jgen.apply(variables, jnp.asarray(x), 1, method="encode")
    got = jgen.apply(variables, c, s, 2, method="decode")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)
