"""Golden-parity tests: munit_tpu.core.ops vs torch reference math.

torch (CPU) is used only to compute reference values for the exact ops the
reference network relies on; no reference code is imported.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from munit_tpu.core import ops

RTOL, ATOL = 1e-5, 1e-5


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return np.transpose(x_nchw.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_instance_norm(rng):
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    want = nhwc(F.instance_norm(nchw(x), eps=1e-5))
    got = np.asarray(ops.instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_adain_matches_batch_norm_trick(rng):
    # Reference AdaIN: F.batch_norm over (1, B*C, H, W) with per-(b,c) weight
    # (std/gamma) and bias (mean/beta), training=True (networks.py:823-845).
    b, c, h, w = 2, 6, 8, 8
    x = rng.randn(b, h, w, c).astype(np.float32)
    gamma = rng.randn(b, c).astype(np.float32)
    beta = rng.randn(b, c).astype(np.float32)

    xt = nchw(x).contiguous().view(1, b * c, h, w)
    want = F.batch_norm(
        xt, torch.zeros(b * c), torch.ones(b * c),
        torch.from_numpy(gamma.reshape(-1)), torch.from_numpy(beta.reshape(-1)),
        True, 0.1, 1e-5).view(b, c, h, w)
    got = np.asarray(ops.adain(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
    np.testing.assert_allclose(got, nhwc(want), rtol=1e-4, atol=1e-4)


def test_whole_layer_norm(rng):
    # Custom LayerNorm (networks.py:851-878): whole-tensor per-sample stats,
    # unbiased std, eps added to std, per-channel affine.
    b, c, h, w = 3, 4, 6, 6
    x = rng.randn(b, h, w, c).astype(np.float32)
    gamma = rng.rand(c).astype(np.float32)
    beta = rng.randn(c).astype(np.float32)

    xt = nchw(x)
    mean = xt.view(b, -1).mean(1).view(b, 1, 1, 1)
    std = xt.view(b, -1).std(1).view(b, 1, 1, 1)
    want = (xt - mean) / (std + 1e-5)
    want = want * torch.from_numpy(gamma).view(1, c, 1, 1) + \
        torch.from_numpy(beta).view(1, c, 1, 1)

    got = np.asarray(ops.whole_layer_norm(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
    np.testing.assert_allclose(got, nhwc(want), rtol=RTOL, atol=ATOL)


def test_avg_pool_3x3_s2_count_include_pad_false(rng):
    for hw in [(8, 8), (7, 9), (256, 256)]:
        x = rng.randn(2, hw[0], hw[1], 3).astype(np.float32)
        want = nhwc(F.avg_pool2d(nchw(x), 3, stride=2, padding=1,
                                 count_include_pad=False))
        got = np.asarray(ops.avg_pool_3x3_s2(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_upsample_nearest(rng):
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    want = nhwc(F.interpolate(nchw(x), scale_factor=2))
    got = np.asarray(ops.upsample_nearest(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("pad_type,torch_mode", [
    ("reflect", "reflect"), ("replicate", "replicate"), ("zero", "constant")])
def test_pad2d(rng, pad_type, torch_mode):
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    want = nhwc(F.pad(nchw(x), (3, 3, 3, 3), mode=torch_mode))
    got = np.asarray(ops.pad2d(jnp.asarray(x), 3, pad_type))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("pad_type", ["reflect", "replicate"])
@pytest.mark.parametrize("h,w,p", [(8, 9, 1), (10, 8, 2), (16, 16, 3),
                                   (6, 6, 3)])  # last: fallback path
def test_pad2d_custom_vjp_matches_jnp_pad_grad(rng, pad_type, h, w, p):
    """pad2d's strip-built backward (one concat per axis instead of XLA's
    full-tensor slice+add chain) is numerically the transpose of the pad."""
    jnp_mode = "reflect" if pad_type == "reflect" else "edge"
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
    ct = jnp.asarray(rng.randn(2, h + 2 * p, w + 2 * p, 3).astype(np.float32))
    g_ref = jax.grad(lambda x_: jnp.sum(jnp.pad(
        x_, ((0, 0), (p, p), (p, p), (0, 0)), mode=jnp_mode) * ct))(x)
    g_new = jax.grad(lambda x_: jnp.sum(ops.pad2d(x_, p, pad_type) * ct))(x)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_new),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("k,stride,padding", [(7, 1, 3), (4, 2, 1), (3, 1, 1), (1, 1, 0), (5, 1, 2)])
def test_conv2d_vs_torch(rng, k, stride, padding):
    cin, cout = 3, 8
    x = rng.randn(2, 16, 16, cin).astype(np.float32)
    w_oihw = rng.randn(cout, cin, k, k).astype(np.float32) * 0.1
    bias = rng.randn(cout).astype(np.float32)

    want = nhwc(F.conv2d(nchw(x), torch.from_numpy(w_oihw),
                         torch.from_numpy(bias), stride=stride, padding=padding))
    w_hwio = jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))
    xp = ops.pad2d(jnp.asarray(x), padding, "zero")
    got = np.asarray(ops.conv2d(xp, w_hwio, jnp.asarray(bias), stride))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resize_bilinear_half_pixel(rng):
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    want = nhwc(F.interpolate(nchw(x), size=(15, 15), mode="bilinear",
                              align_corners=False))
    got = np.asarray(ops.resize_bilinear(jnp.asarray(x), (15, 15)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resize_bilinear_align_corners(rng):
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    want = nhwc(F.interpolate(nchw(x), size=(32, 32), mode="bilinear",
                              align_corners=True))
    got = np.asarray(ops.resize_bilinear(jnp.asarray(x), (32, 32),
                                         align_corners=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resize_nearest(rng):
    x = rng.randn(1, 7, 7, 2).astype(np.float32)
    want = nhwc(F.interpolate(nchw(x), size=(256, 256), mode="nearest"))
    got = np.asarray(ops.resize_nearest(jnp.asarray(x), (256, 256)))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_max_pool(rng):
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    want = nhwc(F.max_pool2d(nchw(x), 2, 2))
    got = np.asarray(ops.max_pool(jnp.asarray(x), 2, 2))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    want = nhwc(F.max_pool2d(nchw(x), 3, 2, 1))
    got = np.asarray(ops.max_pool(jnp.asarray(x), 3, 2, 1))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_global_avg_pool(rng):
    x = rng.randn(2, 9, 9, 4).astype(np.float32)
    want = nhwc(F.adaptive_avg_pool2d(nchw(x), 1))
    got = np.asarray(ops.global_avg_pool(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_activations(rng):
    x = rng.randn(4, 5).astype(np.float32) * 3
    xt = torch.from_numpy(x)
    cases = {
        "relu": F.relu(xt), "lrelu": F.leaky_relu(xt, 0.2),
        "selu": F.selu(xt), "tanh": torch.tanh(xt),
    }
    for name, want in cases.items():
        got = np.asarray(ops.activation(name)(jnp.asarray(x)))
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def test_conv2d_s2d_matches_direct_conv():
    """Space-to-depth conv reformulation (ops.conv2d_s2d) is exact vs the
    direct padded conv for the shapes it rescues (stem 7x7 3->64, decoder
    out 7x7 64->3) and a generic 3x3 case, at f=2 and f=4."""
    from munit_tpu.core import ops
    rng = np.random.RandomState(0)
    cases = [(3, 64, 7, 2, 64), (3, 64, 7, 4, 64), (64, 3, 7, 4, 64),
             (64, 3, 7, 2, 72), (32, 32, 3, 2, 48)]
    for cin, cout, k, f, h in cases:
        x = jnp.asarray(rng.randn(2, h, h, cin), jnp.float32)
        kern = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.float32)
        b = jnp.asarray(rng.randn(cout), jnp.float32)
        ref = ops.conv2d(ops.pad2d(x, (k - 1) // 2, "reflect"), kern, b, 1)
        got = ops.conv2d_s2d(x, kern, b, f=f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"{cin}->{cout} k{k} f{f}")


def test_single_pass_moments_match_two_pass():
    from munit_tpu.core import ops
    rng = np.random.RandomState(1)
    # large mean relative to std stresses the E[x^2]-m^2 cancellation
    x = jnp.asarray(rng.randn(4, 16, 16, 8) * 0.1 + 5.0, jnp.float32)
    m, v = ops._moments(x.astype(jnp.float32), (1, 2))
    m_ref = np.mean(np.asarray(x, np.float64), axis=(1, 2), keepdims=True)
    v_ref = np.var(np.asarray(x, np.float64), axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(np.asarray(m), m_ref, rtol=1e-6)
    # f32 E[x^2]-m^2 cancellation bound: rel err ~ (mean/std)^2 * 2^-20-ish;
    # at the extreme mean/std = 50 stressed here that is ~0.3%. Model-level
    # pixel parity (realistic ratios) holds at 1e-4 (test_model_parity).
    np.testing.assert_allclose(np.asarray(v), v_ref, rtol=1e-2, atol=1e-6)


@pytest.mark.parametrize("pad_type,torch_mode", [
    ("reflect", "reflect"), ("replicate", "replicate")])
def test_pad2d_grad_matches_torch(rng, pad_type, torch_mode):
    """Independent truth for the strip-built pad backward: torch autograd
    through F.pad (the reference's padding layers' actual gradient)."""
    p = 2
    x = rng.randn(2, 10, 12, 3).astype(np.float32)
    ct = rng.randn(2, 14, 16, 3).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    tct = torch.from_numpy(ct).permute(0, 3, 1, 2)
    F.pad(tx, (p, p, p, p), mode=torch_mode).backward(tct)
    want = tx.grad.permute(0, 2, 3, 1).numpy()
    got = np.asarray(jax.grad(
        lambda x_: jnp.sum(ops.pad2d(x_, p, pad_type) * jnp.asarray(ct)))(
        jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_whole_ln_stats_s2d_matches_direct():
    """Per-sample whole-tensor LN stats over a space-to-depth VIEW are the
    same elements reduced in a different order — must match the direct
    reduce to f32 summation tolerance (unbiased std + eps-on-std
    semantics, networks.py:851-878)."""
    rng = np.random.RandomState(5)
    y = jnp.asarray(rng.randn(3, 16, 16, 8) * 1.7 + 0.4, jnp.float32)
    mean, std_eps = ops.whole_ln_stats_s2d(y, f=4)
    yf = np.asarray(y, np.float64).reshape(3, -1)
    m_ref = yf.mean(axis=1)
    s_ref = yf.std(axis=1, ddof=1) + 1e-5
    np.testing.assert_allclose(np.asarray(mean)[:, 0, 0, 0], m_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std_eps)[:, 0, 0, 0], s_ref,
                               rtol=1e-5)


def test_decoder_ln_s2d_fusion_exact(monkeypatch):
    """MUNIT_LN_S2D=1 fuses the last up-conv's LN+act into the s2d
    out-conv's input processing — outputs must match the unfused decoder
    bit-for-bit up to f32 summation order."""
    from munit_tpu.nn.generator import Decoder

    rng = np.random.RandomState(6)
    dec = Decoder(n_upsample=2, n_res=2, dim=32, output_dim=3,
                  res_norm="adain", activ="relu", pad_type="reflect")
    x = jnp.asarray(rng.randn(2, 16, 16, 32) * 0.5, jnp.float32)
    ap = jnp.asarray(rng.randn(2, dec.num_adain_params) * 0.3, jnp.float32)

    monkeypatch.setenv("MUNIT_LN_S2D", "0")
    params = dec.init(jax.random.PRNGKey(0), x, ap)
    ref = np.asarray(dec.apply(params, x, ap))

    monkeypatch.setenv("MUNIT_LN_S2D", "1")
    params_f = dec.init(jax.random.PRNGKey(0), x, ap)
    chex = jax.tree_util.tree_structure(params_f)
    assert chex == jax.tree_util.tree_structure(params), \
        "fusion must not change the parameter tree"
    got = np.asarray(dec.apply(params, x, ap))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=2e-5)

    # gradients through the fused tail must match too (custom consumers
    # of raw_ln + pre_s2d both sit on the autodiff path)
    def loss(p, fused):
        monkeypatch.setenv("MUNIT_LN_S2D", "1" if fused else "0")
        return jnp.sum(dec.apply(p, x, ap) ** 2)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    # tolerance scaled by the DOMINANT gradient: pre-LN bias grads are
    # structurally ~0 (whole-tensor LN kills constant shifts) and purely
    # noise there; a real VJP-wiring bug shows at the dominant scale
    gmax = max(float(np.abs(np.asarray(a)).max()) for _, a in flat0)
    for (k0, a), (k1, b) in zip(flat0, flat1):
        assert k0 == k1
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4 * max(1.0, gmax),
            err_msg=jax.tree_util.keystr(k0))


def test_depth_to_space_partial():
    """depth_to_space_partial(x, f, g) moves an f-packing to a g-packing
    (g | f) such that finishing with a plain d2s(g) reproduces d2s(f), and
    g=1 degenerates to the full unpack."""
    from munit_tpu.core import ops
    rng = np.random.RandomState(0)
    for f, g in [(4, 2), (4, 1), (4, 4), (8, 2), (6, 3)]:
        x = jnp.asarray(rng.randn(2, 5, 7, f * f * 3), jnp.float32)
        full = ops.depth_to_space(x, f)
        part = ops.depth_to_space_partial(x, f, g)
        assert part.shape == (2, 5 * f // g, 7 * f // g, g * g * 3)
        finished = ops.depth_to_space(part, g) if g > 1 else part
        np.testing.assert_array_equal(np.asarray(finished), np.asarray(full))


def test_packed_instance_norm_exact():
    """packed_instance_norm on an f-packed slab equals instance_norm on the
    unpacked slab (spatial permutation invariance), incl. the fused relu."""
    from munit_tpu.core import ops
    rng = np.random.RandomState(3)
    for f, c in [(2, 8), (4, 5)]:
        y2 = jnp.asarray(rng.randn(2, 6, 6, f * f * c), jnp.float32)
        ref = ops.instance_norm(ops.depth_to_space(y2, f))
        got = ops.depth_to_space(ops.packed_instance_norm(y2, f, c), f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        ref_r = jnp.maximum(ref, 0.0)
        got_r = ops.depth_to_space(
            ops.packed_instance_norm(y2, f, c, relu=True), f)
        np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r),
                                   rtol=2e-5, atol=2e-5)


def test_convblock_packed_stem_parity(monkeypatch):
    """ConvBlock's packed-space norm/act path (MUNIT_PACKED_STEM, default on
    for s2d-rescued convs) matches the unpacked path exactly — forward and
    every-parameter gradients — for the stem (in+relu) and out-conv
    (none+tanh) shapes."""
    import flax.linen as nn
    from munit_tpu.nn.blocks import ConvBlock
    rng = np.random.RandomState(4)

    cases = [
        dict(out_dim=16, kernel_size=7, stride=1, padding=3,
             norm="in", activ="relu", pad_type="reflect", cin=3),
        dict(out_dim=3, kernel_size=7, stride=1, padding=3,
             norm="none", activ="tanh", pad_type="reflect", cin=16),
    ]
    for case in cases:
        cin = case.pop("cin")
        x = jnp.asarray(rng.randn(2, 16, 16, cin), jnp.float32)
        blk = ConvBlock(**case)
        params = blk.init(jax.random.PRNGKey(0), x)

        def run(p, t):
            return blk.apply(p, t)

        def loss(p, t):
            return jnp.sum(run(p, t) ** 2)

        monkeypatch.setenv("MUNIT_PACKED_STEM", "0")
        ref = run(params, x)
        gref = jax.grad(loss)(params, x)
        monkeypatch.setenv("MUNIT_PACKED_STEM", "1")
        got = run(params, x)
        ggot = jax.grad(loss)(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=str(case))
        jax.tree_util.tree_map(
            lambda va, vb: np.testing.assert_allclose(
                np.asarray(vb), np.asarray(va), rtol=2e-4, atol=2e-4,
                err_msg=str(case)),
            gref, ggot)
