"""Full FID production pipeline, end to end, on the real reference fixtures
(VERDICT r1 next-round #5, as far as this environment allows):

  compute_moments CLI (real JPEGs → InceptionV3 pools → mu/sigma npz)
  → evaluate fid CLI (paired FID loader → guided translation with a real
    reference AdaINGen_double checkpoint → pools → Frechet distance vs the
    precomputed moments).

The InceptionV3 weights are RANDOM values in the exact torchvision
state-dict layout, pushed through convert_inception_state_dict — no
pretrained torchvision weights exist in this image (no torchvision/timm,
zero egress), so the number is not a "real FID" of a trained model; the
PIPELINE (loaders, converter, pooling, moment math, sqrtm) is the real one.

Also pins the self-consistency invariant: FID of a set against its own
moments is ~0.
"""

import os
import pickle
import sys

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="/root/reference not available")

from tests.test_real_fixtures import (GEN_P, _save_fake_torchvision_inception,
                                      save_real_gen_ckpt)


@pytest.fixture(scope="module")
def ref_networks():
    scripts = os.path.join(REF, "scripts")
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
    import networks
    return networks


def test_fid_pipeline_end_to_end(tmp_path, ref_networks):
    new_size = 96  # keep CPU inception passes cheap; protocol is size-blind

    # 1. inception ckpt: torchvision layout → converter → pickled variables
    incep_pt = _save_fake_torchvision_inception(tmp_path)
    from munit_tpu.eval.inception import convert_inception_state_dict
    sd = {k: v.numpy() for k, v in torch.load(
        incep_pt, map_location="cpu", weights_only=True).items()}
    variables = jax.tree.map(jnp.asarray, convert_inception_state_dict(sd))
    incep_pkl = tmp_path / "inception.pkl"
    with open(incep_pkl, "wb") as f:
        pickle.dump(variables, f)

    # 2. real-image list (the shipped demo images)
    imgs = sorted(
        os.path.join(REF, "input_folder", n)
        for n in os.listdir(os.path.join(REF, "input_folder")))
    lst = tmp_path / "real.txt"
    lst.write_text("\n".join(imgs))

    # 3. moments of the real set via the production CLI
    moments_npz = tmp_path / "moments.npz"
    from munit_tpu.cli.compute_moments import main as moments_main
    moments_main(["--images", str(lst), "--inception_ckpt", incep_pt,
                  "--out", str(moments_npz), "--new_size", str(new_size),
                  "--batch_size", "3"])
    m = np.load(moments_npz)
    assert m["mu"].shape == (2048,) and m["sigma"].shape == (2048, 2048)

    # 4. generator checkpoint from the REAL reference module
    _, gen_ckpt = save_real_gen_ckpt(tmp_path, ref_networks, seed=3)

    # 5. evaluate fid CLI (the reference's inception_utils.py:258-308 path)
    conf = yaml.safe_load(open("configs/config_256.yaml"))
    conf.update(new_size=new_size, batch_size_fid=3, num_workers=0,
                inception_moment_path=str(moments_npz),
                data_list_fid_a=str(lst), data_list_fid_b=str(lst))
    conf_path = tmp_path / "conf.yaml"
    conf_path.write_text(yaml.safe_dump(conf))

    # --kid rides along: the moments file carries the raw real pool, and
    # KID of translated-vs-real is finite and (translations ≠ reals) positive
    from munit_tpu.cli.evaluate import main as eval_main
    res = eval_main(["fid", "--kid", "--config", str(conf_path),
                     "--checkpoint", gen_ckpt,
                     "--inception_ckpt", str(incep_pkl)])
    fid = res["fid"]
    assert np.isfinite(fid) and fid > 0, res
    assert np.isfinite(res["kid"]) and res["kid"] > 0, res

    # 6. invariant: a set against its own moments → FID ≈ 0
    from munit_tpu.eval.fid import compute_fid_from_pools
    from munit_tpu.eval.inception import InceptionV3, inception_preprocess
    from munit_tpu.data import transforms as T
    from PIL import Image
    net = InceptionV3()
    pools = []
    for p in imgs:
        img = T.resize_shorter(Image.open(p).convert("RGB"), new_size)
        x = jnp.asarray(T.normalize_pm1(T.to_array01(img)))[None]
        pool, _ = net.apply(variables, inception_preprocess(x))
        pools.append(np.asarray(pool))
    pools = np.concatenate(pools)
    self_fid = compute_fid_from_pools(pools, m["mu"], m["sigma"])
    # tolerance: with N=3 pools the covariances are rank-2 and the sqrtm is
    # poorly conditioned, and the moments CLI pools run at batch 3 while
    # this recompute runs at batch 1 (different f32 conv accumulation).
    # Distinct image sets measure FID in the hundreds here; ~0.2 ≈ "same".
    assert abs(self_fid) < 1.0, self_fid
