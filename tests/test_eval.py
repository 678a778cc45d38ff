"""Eval subsystem tests: FID Newton-Schulz vs scipy, IS/CIS vs scipy entropy,
slerp, grid writer, InceptionV3 shapes + converter key coverage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from munit_tpu.eval import (
    sqrt_newton_schulz, frechet_distance, inception_score,
    conditional_inception_score, slerp, get_slerp_interp, make_grid,
)
from munit_tpu.eval.fid import frechet_distance_scipy, cov


def rand_cov(rng, d):
    a = rng.randn(d, d).astype(np.float32)
    return (a @ a.T / d + np.eye(d, dtype=np.float32) * 0.1)


def test_newton_schulz_sqrt():
    rng = np.random.RandomState(0)
    a = rand_cov(rng, 32)
    s = np.asarray(sqrt_newton_schulz(jnp.asarray(a), 100))
    np.testing.assert_allclose(s @ s, a, rtol=1e-3, atol=1e-3)


def test_fid_matches_scipy():
    rng = np.random.RandomState(1)
    d = 16
    mu1, mu2 = rng.randn(d).astype(np.float32), rng.randn(d).astype(np.float32)
    s1, s2 = rand_cov(rng, d), rand_cov(rng, d)
    got = frechet_distance(mu1, s1, mu2, s2, num_iters=200)
    want = frechet_distance_scipy(mu1, s1, mu2, s2)
    assert abs(got - want) / max(abs(want), 1) < 1e-3


def test_fid_zero_for_identical():
    rng = np.random.RandomState(2)
    mu, sigma = rng.randn(8).astype(np.float32), rand_cov(rng, 8)
    assert abs(frechet_distance(mu, sigma, mu, sigma, 200)) < 1e-2


def test_cov_matches_numpy():
    rng = np.random.RandomState(3)
    x = rng.randn(50, 6).astype(np.float32)
    np.testing.assert_allclose(np.asarray(cov(jnp.asarray(x))),
                               np.cov(x, rowvar=False), rtol=1e-4, atol=1e-5)


def test_inception_score_vs_scipy():
    from scipy.stats import entropy
    rng = np.random.RandomState(4)
    preds = rng.dirichlet(np.ones(10), size=20).astype(np.float32)
    py = preds.sum(axis=0)
    want = np.exp(np.mean([entropy(preds[i], py) for i in range(20)]))
    got = inception_score(preds)
    assert abs(got - want) < 1e-5


def test_conditional_inception_score():
    rng = np.random.RandomState(5)
    # deterministic per-image outputs → CIS ≈ exp(0) = 1
    preds = np.repeat(rng.dirichlet(np.ones(10), size=4)[:, None, :], 5, axis=1)
    assert abs(conditional_inception_score(preds.astype(np.float32)) - 1.0) < 1e-5


def test_slerp_endpoints_and_norm():
    rng = np.random.RandomState(6)
    low, high = rng.randn(16), rng.randn(16)
    np.testing.assert_allclose(slerp(0.0, low, high), low, atol=1e-6)
    np.testing.assert_allclose(slerp(1.0, low, high), high, atol=1e-6)
    sweep = get_slerp_interp(2, 5, 16, np.random.RandomState(0))
    assert sweep.shape == (10, 16)


def test_make_grid_layout():
    imgs = np.zeros((4, 8, 8, 3), np.float32)
    imgs[0] = 1.0
    grid = make_grid(imgs, nrow=4)
    assert grid.shape == (8, 32, 3)
    assert grid[:8, :8].min() == 255
    assert grid[:8, 8:].max() == 0


def test_inception_v3_shapes_and_converter():
    from munit_tpu.eval.inception import (
        InceptionV3, convert_inception_state_dict, inception_preprocess)
    net = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    variables = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x))
    pool, logits = jax.eval_shape(lambda v: net.apply(v, x), variables)
    assert pool.shape == (1, 2048)
    assert logits.shape == (1, 1000)

    # converter: build a fake torchvision state dict from our own param
    # shapes and check a full key/shape round-trip
    flat_params = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_stats = jax.tree_util.tree_flatten_with_path(
        variables["batch_stats"])[0]

    def scope_path(kp):
        return [k.key for k in kp]

    sd = {}
    for kp, leaf in flat_params:
        path = scope_path(kp)
        if path[-1] == "kernel" and len(path) > 1:
            t = ".".join(path[:-1])
            sd[f"{t}.conv.weight"] = np.zeros(
                (leaf.shape[3], leaf.shape[2], leaf.shape[0], leaf.shape[1]),
                np.float32)
        elif path[-1] == "bn_scale":
            sd[".".join(path[:-1]) + ".bn.weight"] = np.zeros(leaf.shape, np.float32)
        elif path[-1] == "bn_bias":
            sd[".".join(path[:-1]) + ".bn.bias"] = np.zeros(leaf.shape, np.float32)
        elif path[-1] == "fc_kernel":
            sd["fc.weight"] = np.zeros((leaf.shape[1], leaf.shape[0]), np.float32)
        elif path[-1] == "fc_bias":
            sd["fc.bias"] = np.zeros(leaf.shape, np.float32)
    for kp, leaf in flat_stats:
        path = scope_path(kp)
        key = "running_mean" if path[-1] == "mean" else "running_var"
        sd[".".join(path[:-1]) + f".bn.{key}"] = np.zeros(leaf.shape, np.float32)

    converted = convert_inception_state_dict(sd)
    want_shapes = jax.tree.map(lambda l: l.shape, variables)
    got_shapes = jax.tree.map(lambda l: np.asarray(l).shape,
                              {"params": converted["params"],
                               "batch_stats": converted["batch_stats"]})
    assert want_shapes == got_shapes

    y = jax.eval_shape(lambda: inception_preprocess(jnp.zeros((2, 256, 256, 3))))
    assert y.shape == (2, 299, 299, 3)


def test_kid_zero_for_same_distribution():
    from munit_tpu.eval import kid
    rng = np.random.RandomState(0)
    base = rng.randn(400, 64).astype(np.float32)
    mean_same, _ = kid(base[:200], base[200:], n_subsets=20, subset_size=100)
    shifted = base[200:] + 2.0
    mean_diff, _ = kid(base[:200], shifted, n_subsets=20, subset_size=100)
    assert abs(mean_same) < 0.05
    assert mean_diff > mean_same + 0.5


def test_evaluate_fid_mesh_parity(tmp_path):
    """`evaluate fid --mesh auto` (data-parallel translate+inception over the
    fake 8-device mesh) returns the same FID as the unsharded path, including
    the pad/slice handling for batches not divisible by the device count."""
    import pickle
    import yaml
    from PIL import Image
    from munit_tpu.eval.inception import InceptionV3

    rng = np.random.RandomState(0)
    imgs = []
    for i in range(5):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(p)
        imgs.append(str(p))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(imgs))

    net = InceptionV3()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    incep_pkl = tmp_path / "inception.pkl"
    with open(incep_pkl, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, variables), f)
    a = np.random.RandomState(1).randn(2048, 64)
    moments = tmp_path / "moments.npz"
    np.savez(moments, mu=a.mean(1), sigma=a @ a.T / 64)

    conf = {
        "gen_state": 1, "guided": 1, "new_size": 40, "batch_size_fid": 3,
        "num_workers": 0, "crop_image_height": 32, "crop_image_width": 32,
        "gen": {"dim": 16, "mlp_dim": 32, "style_dim": 8, "activ": "relu",
                "n_downsample": 2, "n_res": 2, "pad_type": "reflect"},
        "inception_moment_path": str(moments),
        "data_list_fid_a": str(lst), "data_list_fid_b": str(lst),
    }
    conf_path = tmp_path / "conf.yaml"
    conf_path.write_text(yaml.safe_dump(conf))

    # random generator params via checkpoint_tools-compatible npz packing
    from munit_tpu.config import validate
    from munit_tpu.train import GenBundle
    gen = GenBundle(validate(conf))
    params = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, 40, 40, 3)))
    from munit_tpu.io.checkpoint import save_inference_params

    ckpt = tmp_path / "gen.npz"
    save_inference_params(str(ckpt), params)

    from munit_tpu.cli.evaluate import main as eval_main
    args = ["fid", "--config", str(conf_path), "--checkpoint", str(ckpt),
            "--inception_ckpt", str(incep_pkl)]
    fid_off = eval_main(args)
    fid_mesh = eval_main(args + ["--mesh", "auto"])
    assert np.isfinite(fid_off)
    np.testing.assert_allclose(fid_mesh, fid_off, rtol=2e-3)


def test_compute_moments_mesh_parity(tmp_path):
    """compute_moments --mesh auto equals the unsharded run (pad/slice on a
    3-image set over the fake 8-device mesh)."""
    import pickle
    from PIL import Image
    from munit_tpu.eval.inception import InceptionV3

    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"r{i}.png"
        Image.fromarray(rng.randint(0, 255, (48, 56, 3), np.uint8)).save(p)
        paths.append(str(p))
    (tmp_path / "list.txt").write_text("\n".join(paths))

    net = InceptionV3()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    incep = tmp_path / "inception.pkl"
    with open(incep, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, variables), f)

    from munit_tpu.cli.compute_moments import main as mm
    base = ["--images", str(tmp_path / "list.txt"), "--inception_ckpt",
            str(incep), "--new_size", "48", "--batch_size", "3"]
    mm(base + ["--out", str(tmp_path / "off.npz")])
    mm(base + ["--out", str(tmp_path / "on.npz"), "--mesh", "auto"])
    off, on = np.load(tmp_path / "off.npz"), np.load(tmp_path / "on.npz")
    assert off["pool"].shape == on["pool"].shape == (3, 2048)
    np.testing.assert_allclose(on["pool"], off["pool"], atol=2e-4)
    np.testing.assert_allclose(on["mu"], off["mu"], atol=2e-4)
