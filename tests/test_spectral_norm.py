"""SpectralNorm ConvBlock path (networks.py:885-942 semantics): power
iteration normalizes the kernel's top singular value toward 1; u/v state
updates only when update_sn=True; the sn path skips padding (ref quirk)."""

import numpy as np

import jax
import jax.numpy as jnp

from munit_tpu.nn.blocks import ConvBlock


def test_spectral_norm_normalizes_singular_value():
    blk = ConvBlock(8, 3, 1, 1, norm="sn", activ="none", pad_type="zero")
    x = jnp.zeros((1, 8, 8, 4))
    variables = blk.init({"params": jax.random.PRNGKey(0)}, x)
    params, spectral = variables["params"], variables["spectral"]

    # scale the kernel so its top singular value is far from 1
    params = {**params, "kernel": params["kernel"] * 7.3}

    # run power iterations to convergence via repeated update_sn=True calls
    for _ in range(50):
        _, updates = blk.apply({"params": params, "spectral": spectral}, x,
                               None, True, mutable=["spectral"])
        spectral = updates["spectral"]

    w = np.asarray(params["kernel"])
    wmat = np.transpose(w, (3, 0, 1, 2)).reshape(8, -1)
    u = np.asarray(spectral["u"])
    v = np.asarray(spectral["v"])
    sigma_est = u @ (wmat @ v)
    sigma_true = np.linalg.svd(wmat, compute_uv=False)[0]
    assert abs(sigma_est - sigma_true) / sigma_true < 1e-3

    # output equals conv with kernel / sigma (no padding on the sn path)
    rng = np.random.RandomState(0)
    xin = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    y, _ = blk.apply({"params": params, "spectral": spectral}, xin, None,
                     False, mutable=["spectral"])
    assert y.shape == (1, 6, 6, 8)  # 8-3+1: padding skipped in sn mode


def test_spectral_state_frozen_without_update():
    blk = ConvBlock(4, 3, 1, 1, norm="sn", activ="none")
    x = jnp.zeros((1, 6, 6, 3))
    variables = blk.init({"params": jax.random.PRNGKey(1)}, x)
    _, upd = blk.apply(variables, x, None, False, mutable=["spectral"])
    np.testing.assert_allclose(np.asarray(upd["spectral"]["u"]),
                               np.asarray(variables["spectral"]["u"]))
