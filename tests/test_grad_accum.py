"""Gradient accumulation (config `grad_accum: K`) ≡ the full-batch step.

K>1 chunks the batch into K sequential micro-batches inside the dis/gen
steps (trainer._accum_grads, lax.scan) and averages the gradients. Every
shipped loss term is a full-count mean, so the mean of equal-chunk means is
the full-batch value exactly — updated params, metrics, and the rng stream
must all match grad_accum=1 (modulo float reassociation)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from munit_tpu.config import validate
from munit_tpu.train import MUNITTrainer

CROP = 32


def tiny_conf(grad_accum, semantic_w=0):
    return validate({
        "gen_state": 1, "guided": 1, "recon_mask": 1, "batch_size": 4,
        "grad_accum": grad_accum, "semantic_w": semantic_w,
        "crop_image_height": CROP, "crop_image_width": CROP, "new_size": CROP,
        "gen": {"dim": 16, "mlp_dim": 32, "style_dim": 8, "activ": "relu",
                "n_downsample": 2, "n_res": 2, "pad_type": "reflect"},
        "dis": {"dim": 16, "norm": "none", "activ": "lrelu", "n_layer": 3,
                "gan_type": "lsgan", "num_scales": 2, "pad_type": "reflect"},
        "optimizer": "extra_adam",
    })


def make_trainer(conf):
    tr = MUNITTrainer(conf, jax.random.PRNGKey(7))
    if conf["semantic_w"] > 0:
        tr.load_segmenter(tr.seg_model_def.init(
            jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))
    return tr


@pytest.mark.parametrize("semantic_w", [0, 3])
def test_grad_accum_matches_full_batch(semantic_w):
    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.randn(4, CROP, CROP, 3).astype(np.float32) * 0.3)
    x_b = jnp.asarray(rng.randn(4, CROP, CROP, 3).astype(np.float32) * 0.3)
    m_a = jnp.asarray((rng.rand(4, CROP, CROP, 1) > 0.5).astype(np.float32))
    m_b = jnp.asarray((rng.rand(4, CROP, CROP, 1) > 0.5).astype(np.float32))

    t1 = make_trainer(tiny_conf(1, semantic_w))
    t1.fused = False      # compare against the same two-step path
    t2 = make_trainer(tiny_conf(2, semantic_w))
    t2.fused = False      # this test pins the UNFUSED chunked pair;
    # the fused chunked step has its own parity tests below

    for it in range(2):   # even (extrapolation) + odd (step) ExtraAdam phase
        t1.iterations = t2.iterations = it
        m1 = dict(t1.dis_update(x_a, x_b))
        m1.update(t1.gen_update(x_a, x_b, m_a, m_b))
        m2 = dict(t2.dis_update(x_a, x_b))
        m2.update(t2.gen_update(x_a, x_b, m_a, m_b))
        # it=0 runs on identical params: losses differ only by summation
        # reassociation (~1e-7 rel). From it=1 on, the ~1e-7 gradient
        # reassociation has passed through Adam's m/√v normalization, which
        # turns it into O(lr)-scale param nudges → ~1e-5-rel loss shifts.
        tol = 2e-5 if it == 0 else 1e-3
        for k in ("loss_dis_total", "loss_gen_total", "loss_gen_adv_a",
                  "loss_gen_cycrecon_x_a", "loss_sem_seg"):
            if k in m1:
                np.testing.assert_allclose(
                    float(m2[k]), float(m1[k]), rtol=tol, atol=1e-6,
                    err_msg=f"{k} it={it}")

    np.testing.assert_array_equal(np.asarray(t1.state["rng"]),
                                  np.asarray(t2.state["rng"]))
    # An (Extra)Adam update moves each weight by at most ~lr per step
    # regardless of gradient scale, so after 2 steps a reassociation-level
    # gradient difference can at worst flip update signs for ~2·lr·steps
    # absolute drift. lr=1e-4 → bound 4e-4; use 5e-4. The EXACT equivalence
    # of the chunked-mean gradient itself is pinned analytically below
    # (test_accum_grads_helper_exact) with no optimizer in the way.
    for net in ("gen", "dis_a", "dis_b"):
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(t1.state[net])[0],
                jax.tree_util.tree_flatten_with_path(t2.state[net])[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=5e-4,
                err_msg=f"{net} {jax.tree_util.keystr(kp)}")


def test_accum_grads_helper_exact():
    """_accum_grads is exactly the chunk-mean: pinned against an analytic
    per-chunk function with no float-reassociation ambiguity."""
    tr = make_trainer(tiny_conf(4))
    xs = {"x": jnp.arange(8, dtype=jnp.float32).reshape(8, 1),
          "y": jnp.arange(8, dtype=jnp.float32).reshape(8, 1) + 100.0}

    def chunk_fn(x, y):
        # grads pytree: dict; metrics pytree: dict of scalars
        return ({"g": x * 2.0}, {"m": jnp.mean(y)})

    grads, metrics = tr._accum_grads(chunk_fn, xs)
    # chunk grads stay per-sample arrays? No: _accum_grads averages the
    # PYTREE over chunks — each chunk's {"g": [2,1]} arrays are averaged
    # elementwise across the 4 chunks.
    want_g = np.mean((np.arange(8.0) * 2).reshape(4, 2, 1), axis=0)
    np.testing.assert_array_equal(np.asarray(grads["g"]), want_g)
    np.testing.assert_allclose(float(metrics["m"]), np.mean(
        np.arange(8.0) + 100.0))


def test_grad_accum_validation():
    with pytest.raises(ValueError, match="divisible"):
        validate({"batch_size": 3, "grad_accum": 2})
    with pytest.raises(ValueError, match="positive"):
        validate({"batch_size": 4, "grad_accum": 0})


def test_grad_accum_env_override_validated(monkeypatch):
    """MUNIT_GRAD_ACCUM bypasses config.validate(); the trainer re-checks it
    with the same messages instead of silently ignoring <1 or failing at
    trace time on non-divisible values (ADVICE r3)."""
    monkeypatch.setenv("MUNIT_GRAD_ACCUM", "0")
    with pytest.raises(ValueError, match="positive"):
        make_trainer(tiny_conf(1))
    monkeypatch.setenv("MUNIT_GRAD_ACCUM", "3")  # batch_size 4 not divisible
    with pytest.raises(ValueError, match="divisible"):
        make_trainer(tiny_conf(1))


def adv_conf(grad_accum):
    c = tiny_conf(grad_accum)
    c["adaptation"]["adv_lambda"] = 6
    c["adaptation"]["dfeat_lambda"] = 1
    return validate(c)


def test_grad_accum_adv_lambda_warns_and_runs():
    """adv_lambda>0 runs the sim/real DomainClassifier with train-mode BN:
    with grad_accum>1 each micro-batch normalizes with its own chunk stats,
    so those gradients deviate from grad_accum=1 (docs/PARITY.md #12). The
    trainer warns at construction; everything else still runs and every
    non-BN term stays chunk-mean-exact at it=0 (identical initial params)."""
    with pytest.warns(UserWarning, match="train-mode BatchNorm"):
        t2 = make_trainer(adv_conf(2))
    t2.fused = False

    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")   # no warning for grad_accum=1
        t1 = make_trainer(adv_conf(1))
    t1.fused = False

    rng = np.random.RandomState(3)
    x_a = jnp.asarray(rng.randn(4, CROP, CROP, 3).astype(np.float32) * 0.3)
    x_b = jnp.asarray(rng.randn(4, CROP, CROP, 3).astype(np.float32) * 0.3)
    m_a = jnp.asarray((rng.rand(4, CROP, CROP, 1) > 0.5).astype(np.float32))
    m_b = jnp.asarray((rng.rand(4, CROP, CROP, 1) > 0.5).astype(np.float32))
    t1.iterations = t2.iterations = 0
    m1 = t1.gen_update(x_a, x_b, m_a, m_b)
    m2 = t2.gen_update(x_a, x_b, m_a, m_b)
    # the BN-classifier fool term itself deviates (per-chunk statistics)...
    assert np.isfinite(float(m2["loss_classifier_adv_sr"]))
    # ...while full-count-mean terms remain exact up to reassociation
    for k in ("loss_gen_recon_x_a", "loss_gen_cycrecon_x_a",
              "loss_gen_adv_a"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)


def test_dis_gen_update_accumulates_without_warning():
    """Since r5 the fused step DOES accumulate (_dis_gen_step_accum): a
    direct caller with grad_accum>1 gets chunked behavior, no warning.
    (r4 warned and ran full-batch; the parity of the chunked step is
    pinned by the test_fused_accum_* tests below.)"""
    t2 = make_trainer(tiny_conf(2))
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, CROP, CROP, 3).astype(np.float32) * 0.3)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        m = t2.dis_gen_update(x, x)
    assert np.isfinite(float(m["loss_gen_total"]))


def _batch(seed=0, n=4):
    rng = np.random.RandomState(seed)
    x_a = jnp.asarray(rng.randn(n, CROP, CROP, 3).astype(np.float32) * 0.3)
    x_b = jnp.asarray(rng.randn(n, CROP, CROP, 3).astype(np.float32) * 0.3)
    m_a = jnp.asarray((rng.rand(n, CROP, CROP, 1) > 0.5).astype(np.float32))
    m_b = jnp.asarray((rng.rand(n, CROP, CROP, 1) > 0.5).astype(np.float32))
    return x_a, x_b, m_a, m_b


def _params_close(t1, t2, atol, msg):
    for net in ("gen", "dis_a", "dis_b"):
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(t1.state[net])[0],
                jax.tree_util.tree_flatten_with_path(t2.state[net])[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=atol,
                err_msg=f"{msg}: {net} {jax.tree_util.keystr(kp)}")


@pytest.mark.parametrize("semantic_w", [0, 3])
def test_fused_accum_matches_unfused_accum(semantic_w):
    """VERDICT r4 #2: the fused chunked step (_dis_gen_step_accum, two
    phases in ONE jit) ≡ the unfused dis_update/gen_update pair at the
    same K — same rng stream, same chunk slicing, same D-then-G ordering
    with gen adversarial terms against the UPDATED D. Differences are pure
    float reassociation (different XLA programs for the same math)."""
    x_a, x_b, m_a, m_b = _batch()

    tf = make_trainer(tiny_conf(2, semantic_w))
    assert tf.fused   # K>1 no longer forces the unfused path
    tu = make_trainer(tiny_conf(2, semantic_w))
    tu.fused = False

    for it in range(2):   # both ExtraAdam phases
        tf.iterations = tu.iterations = it
        mf = tf.dis_gen_update(x_a, x_b, m_a, m_b)
        mu = dict(tu.dis_update(x_a, x_b))
        mu.update(tu.gen_update(x_a, x_b, m_a, m_b))
        tol = 2e-5 if it == 0 else 1e-3
        for k in ("loss_dis_total", "loss_gen_total", "loss_gen_adv_a",
                  "loss_gen_cycrecon_x_a", "loss_sem_seg"):
            if k in mu:
                np.testing.assert_allclose(
                    float(mf[k]), float(mu[k]), rtol=tol, atol=1e-6,
                    err_msg=f"{k} it={it}")
    np.testing.assert_array_equal(np.asarray(tf.state["rng"]),
                                  np.asarray(tu.state["rng"]))
    _params_close(tf, tu, 5e-4, "fusedK-vs-unfusedK")


def test_fused_accum_matches_full_batch():
    """fused-K ≡ fused K=1 for every full-count-mean term (all shipped
    non-BN terms): same Adam-envelope bound as the unfused comparison."""
    x_a, x_b, m_a, m_b = _batch(1)
    t1 = make_trainer(tiny_conf(1))
    t2 = make_trainer(tiny_conf(2))
    for it in range(2):
        t1.iterations = t2.iterations = it
        m1 = t1.dis_gen_update(x_a, x_b, m_a, m_b)
        m2 = t2.dis_gen_update(x_a, x_b, m_a, m_b)
        tol = 2e-5 if it == 0 else 1e-3
        for k in ("loss_dis_total", "loss_gen_total", "loss_gen_adv_a"):
            np.testing.assert_allclose(
                float(m2[k]), float(m1[k]), rtol=tol, atol=1e-6,
                err_msg=f"{k} it={it}")
    np.testing.assert_array_equal(np.asarray(t1.state["rng"]),
                                  np.asarray(t2.state["rng"]))
    _params_close(t1, t2, 5e-4, "fusedK-vs-K1")


def test_accum_shared_fwd_variant(monkeypatch):
    """MUNIT_ACCUM_SHARED_FWD=1 (one shared vjp forward per micro-batch):
    the documented deviation is ONLY the gen adversarial terms seeing the
    pre-update D (docs/PARITY.md #12b). With gan_w=0 the adversarial terms
    vanish and the variant must match the exact two-phase path to float
    tolerance; with gan_w>0 it must still run finite and match the
    two-phase dis losses exactly (phase A math is identical)."""
    x_a, x_b, m_a, m_b = _batch(2)

    def gw0(c):
        c = dict(c)
        c["gan_w"] = 0.0
        return validate(c)

    t_exact = make_trainer(gw0(tiny_conf(2)))
    monkeypatch.setenv("MUNIT_ACCUM_SHARED_FWD", "1")
    t_shared = make_trainer(gw0(tiny_conf(2)))
    assert t_shared.accum_shared_fwd and not t_exact.accum_shared_fwd
    for it in range(2):
        t_exact.iterations = t_shared.iterations = it
        me = t_exact.dis_gen_update(x_a, x_b, m_a, m_b)
        ms = t_shared.dis_gen_update(x_a, x_b, m_a, m_b)
        tol = 2e-5 if it == 0 else 1e-3
        for k in ("loss_dis_total", "loss_gen_total"):
            np.testing.assert_allclose(
                float(ms[k]), float(me[k]), rtol=tol, atol=1e-6,
                err_msg=f"{k} it={it}")
    _params_close(t_exact, t_shared, 5e-4, "sharedfwd-gw0")

    # gan_w>0: finite, and dis metrics (phase-A math, pre-update D in both
    # paths) agree at it=0
    t_g = make_trainer(tiny_conf(2))
    ms = t_g.dis_gen_update(x_a, x_b, m_a, m_b)
    assert all(np.isfinite(float(v)) for v in ms.values())
    t_e = make_trainer(tiny_conf(2))
    monkeypatch.delenv("MUNIT_ACCUM_SHARED_FWD")
    me = t_e.dis_gen_update(x_a, x_b, m_a, m_b)
    np.testing.assert_allclose(float(ms["loss_dis_total"]),
                               float(me["loss_dis_total"]),
                               rtol=2e-5, atol=1e-6)


def test_accum_chunk_dis_exact(monkeypatch):
    """accum_chunk_dis=1 (chunk the dis-grad computations too — the HBM
    lever for HD K>1) is exact vs the default full-batch phase A: the dis
    loss is a full-count mean, so both give the same gradients up to
    reassociation."""
    x_a, x_b, m_a, m_b = _batch(4)
    monkeypatch.setenv("MUNIT_ACCUM_CHUNK_DIS", "1")
    t_c = make_trainer(tiny_conf(2))
    assert t_c.accum_chunk_dis
    monkeypatch.delenv("MUNIT_ACCUM_CHUNK_DIS")
    t_f = make_trainer(tiny_conf(2))
    assert not t_f.accum_chunk_dis
    for it in range(2):
        t_c.iterations = t_f.iterations = it
        mc = dict(t_c.dis_update(x_a, x_b))
        mc.update(t_c.dis_gen_update(x_a, x_b, m_a, m_b))
        mf = dict(t_f.dis_update(x_a, x_b))
        mf.update(t_f.dis_gen_update(x_a, x_b, m_a, m_b))
        tol = 2e-5 if it == 0 else 1e-3
        for k in ("loss_dis_total", "loss_gen_total"):
            np.testing.assert_allclose(float(mc[k]), float(mf[k]),
                                       rtol=tol, atol=1e-6,
                                       err_msg=f"{k} it={it}")
    _params_close(t_c, t_f, 5e-4, "chunkdis-vs-fullbatch")
