"""Wide-path equivalence: MUNIT_WIDE 0/1/2 are schedules, not math.

wide=1 batches same-weight forwards (fake+real per dis, both-domain
style/seg encodes, per-domain decode pairs); wide=2 additionally stacks
the two domain branches into vmapped grouped convs. Per-sample math is
batch-size independent (instance/adaptive norms only), so the loss
metrics of a dis and gen update must agree across modes. Also covers
vmap over the strip-built reflect-pad custom VJP (wide=2 is the only
vmapped consumer).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from munit_tpu.config import validate
from munit_tpu.train import MUNITTrainer
from tests.torch_mirror import small_dis_params, small_gen_params


def _metrics(wide, monkeypatch):
    monkeypatch.setenv("MUNIT_WIDE", str(wide))
    conf = validate({
        "gen_state": 1, "guided": 1, "semantic_w": 0, "recon_mask": 0,
        "batch_size": 2, "new_size": 64, "crop_image_height": 64,
        "crop_image_width": 64, "gen": small_gen_params(),
        "dis": small_dis_params()})
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    x_b = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    tr.iterations = 0
    md = tr.dis_update(x_a, x_b)
    mg = tr.gen_update(x_a, x_b)
    return {**{k: float(v) for k, v in md.items()},
            **{k: float(v) for k, v in mg.items()}}


def test_wide_modes_equivalent(monkeypatch):
    base = _metrics(0, monkeypatch)
    for wide in (1, 2):
        got = _metrics(wide, monkeypatch)
        for k, v in base.items():
            np.testing.assert_allclose(
                got[k], v, rtol=2e-4, atol=1e-5,
                err_msg=f"wide={wide} metric {k}")
