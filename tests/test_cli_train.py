"""End-to-end training CLI test: tiny config + tiny dataset, few iterations,
checkpoints + metrics + sample grids written. Also covers remat decode."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image

import jax

from tests import torch_mirror as tm

CROP = 32


@pytest.fixture
def workspace(tmp_path):
    rng = np.random.RandomState(0)

    def write_list(name, n, size=48, gray=False):
        paths = []
        for i in range(n):
            p = tmp_path / f"{name}_{i}.png"
            if gray:
                arr = (rng.rand(size, size) > 0.5).astype(np.uint8) * 255
            else:
                arr = rng.randint(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(arr).save(p)
            paths.append(str(p))
        lst = tmp_path / f"{name}.txt"
        lst.write_text("\n".join(paths))
        return str(lst)

    lists = {
        "train_a": write_list("ta", 4), "train_b": write_list("tb", 4),
        "test_a": write_list("sa", 2), "test_b": write_list("sb", 2),
        "seg_a": write_list("ma", 4, gray=True),
        "seg_b": write_list("mb", 4, gray=True),
    }

    conf = {
        "new_size": 40, "crop_image_height": CROP, "crop_image_width": CROP,
        "gen_state": 1, "guided": 1, "semantic_w": 0, "recon_mask": 1,
        "gen": dict(tm.small_gen_params()),
        "dis": dict(tm.small_dis_params()),
        "batch_size": 2, "display_size": 2, "max_iter": 3, "log_iter": 1,
        "image_save_iter": 2, "image_display_iter": 2,
        "snapshot_save_iter": 2, "ratio_disc_gen": 2, "num_workers": 1,
        "data_folder_train_a": "", "data_list_train_a": lists["train_a"],
        "data_folder_train_b": "", "data_list_train_b": lists["train_b"],
        "data_folder_test_a": "", "data_list_test_a": lists["test_a"],
        "data_folder_test_b": "", "data_list_test_b": lists["test_b"],
        "data_list_train_a_seg": lists["seg_a"],
        "data_list_train_b_seg": lists["seg_b"],
    }
    cpath = tmp_path / "tiny.yaml"
    cpath.write_text(yaml.safe_dump(conf))
    return tmp_path, str(cpath)


def test_cli_train_end_to_end(workspace):
    import glob
    import json

    tmp_path, cpath = workspace
    from munit_tpu.cli.train import main
    main(["--config", cpath, "--output_path", str(tmp_path / "run"),
          "--profile", "1"])

    outdir = tmp_path / "run" / "outputs" / "tiny"
    assert (outdir / "config.yaml").exists()
    assert (outdir / "metrics.jsonl").exists()
    lines = (outdir / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 3
    assert (outdir / "images" / "gen_a2b_train_current.jpg").exists()
    from munit_tpu.io.checkpoint import latest_step
    assert latest_step(str(outdir / "checkpoints")) == 2
    # --profile N wrote an xplane trace of the profiled window (§5.1)
    assert glob.glob(str(outdir / "trace" / "**" / "*.xplane.pb"),
                     recursive=True)
    # host-side throughput is part of the metric stream
    tput = [json.loads(l) for l in lines if "images_per_sec" in l]
    assert tput and tput[-1]["images_per_sec"] > 0


def test_cli_train_in_training_fid(workspace, tmp_path):
    """VERDICT r2 #3: the in-training FID hook (reference train.py:119-130,
    prepared-but-never-called there) must be LIVE in the shipped CLI — a
    short run with random inception weights logs a finite FID at the
    snapshot step."""
    import pickle
    import json
    import jax.numpy as jnp
    from munit_tpu.eval.inception import InceptionV3

    ws, cpath = workspace
    conf = yaml.safe_load(open(cpath))

    # fid pair lists (reuse the test images)
    lists_a = [l for l in open(conf["data_list_test_a"]).read().splitlines()]
    lists_b = [l for l in open(conf["data_list_test_b"]).read().splitlines()]
    fid_list = tmp_path / "fid_pairs.txt"
    fid_list.write_text("\n".join(f"{a} {b}" for a, b
                                  in zip(lists_a, lists_b)))

    # random-weight InceptionV3 variables + random (PSD) real moments
    net = InceptionV3()
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 299, 299, 3)))
    ckpt = tmp_path / "inception.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, variables), f)
    rng = np.random.RandomState(3)
    a = rng.randn(2048, 64).astype(np.float64)
    moments = tmp_path / "moments.npz"
    np.savez(moments, mu=rng.randn(2048), sigma=a @ a.T / 64)

    conf.update({
        "max_iter": 2, "snapshot_save_iter": 2, "image_save_iter": 10,
        "image_display_iter": 10, "semantic_w": 0,
        "eval_fid": 1, "batch_size_fid": 2,
        "data_list_fid_a": str(fid_list), "data_list_fid_b": str(fid_list),
        "inception_moment_path": str(moments),
        "inception_ckpt_path": str(ckpt),
    })
    cpath2 = tmp_path / "tiny_fid.yaml"
    cpath2.write_text(yaml.safe_dump(conf))

    from munit_tpu.cli.train import main
    main(["--config", str(cpath2), "--output_path", str(tmp_path / "runf")])

    outdir = tmp_path / "runf" / "outputs" / "tiny_fid"
    fids = [json.loads(l) for l in
            open(outdir / "metrics.jsonl").read().splitlines()
            if "FID" in json.loads(l)]
    assert fids, "no FID metric logged at the snapshot step"
    assert fids[-1]["step"] == 2
    assert np.isfinite(fids[-1]["FID"])


def test_cli_train_in_training_fid_mesh(workspace, tmp_path):
    """VERDICT r4 #5: in-training FID under a mesh — the sharded
    translate+inception pipeline (the `evaluate fid --mesh auto` machinery)
    wired into the training loop's snapshot hook. Runs on the fake 8-device
    CPU mesh; under --dist the same path assembles global batches from
    per-process slices (prepare_inception_metrics mesh branch)."""
    import pickle
    import json
    import jax.numpy as jnp
    from munit_tpu.eval.inception import InceptionV3

    ws, cpath = workspace
    conf = yaml.safe_load(open(cpath))

    # batch 8 (the data axis) needs 8 training images per domain — the
    # fixture lists only carry 4
    rng8 = np.random.RandomState(7)
    for key in ("data_list_train_a", "data_list_train_b"):
        paths = []
        for i in range(8):
            pth = tmp_path / f"{key}_{i}.png"
            Image.fromarray(
                rng8.randint(0, 255, (48, 48, 3), np.uint8)).save(pth)
            paths.append(str(pth))
        lst = tmp_path / f"{key}.txt"
        lst.write_text("\n".join(paths))
        conf[key] = str(lst)

    lists_a = [l for l in open(conf["data_list_test_a"]).read().splitlines()]
    lists_b = [l for l in open(conf["data_list_test_b"]).read().splitlines()]
    fid_list = tmp_path / "fid_pairs.txt"
    fid_list.write_text("\n".join(f"{a} {b}" for a, b
                                  in zip(lists_a, lists_b)))

    net = InceptionV3()
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 299, 299, 3)))
    ckpt = tmp_path / "inception.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, variables), f)
    rng = np.random.RandomState(3)
    a = rng.randn(2048, 64).astype(np.float64)
    moments = tmp_path / "moments.npz"
    np.savez(moments, mu=rng.randn(2048), sigma=a @ a.T / 64)

    conf.update({
        "max_iter": 2, "snapshot_save_iter": 2, "image_save_iter": 10,
        "image_display_iter": 10, "semantic_w": 0,
        # batch 2 with 2 fid pairs: the mesh branch pads each global batch
        # up to the 8-device data axis and slices the pool back — the pad
        # path is exactly what multi-process feeding exercises
        "eval_fid": 1, "batch_size_fid": 2,
        "data_list_fid_a": str(fid_list), "data_list_fid_b": str(fid_list),
        "inception_moment_path": str(moments),
        "inception_ckpt_path": str(ckpt),
        "batch_size": 8,  # mesh training: batch must fill the data axis
    })
    cpath2 = tmp_path / "tiny_fid_mesh.yaml"
    cpath2.write_text(yaml.safe_dump(conf))

    from munit_tpu.cli.train import main
    main(["--config", str(cpath2), "--output_path", str(tmp_path / "runm"),
          "--mesh"])

    outdir = tmp_path / "runm" / "outputs" / "tiny_fid_mesh"
    fids = [json.loads(l) for l in
            open(outdir / "metrics.jsonl").read().splitlines()
            if "FID" in json.loads(l)]
    assert fids, "no FID metric logged at the snapshot step under --mesh"
    assert fids[-1]["step"] == 2
    assert np.isfinite(fids[-1]["FID"])


def test_remat_decode_trains():
    from munit_tpu.config import validate
    from munit_tpu.train import MUNITTrainer
    import jax.numpy as jnp

    conf = validate({
        "gen_state": 1, "guided": 1, "recon_mask": 0, "batch_size": 2,
        "crop_image_height": CROP, "crop_image_width": CROP, "new_size": CROP,
        "gen": dict(tm.small_gen_params()),
        "dis": dict(tm.small_dis_params()),
    })
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0), remat=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32))
    tr.iterations = 0
    m = tr.gen_update(x, x)
    assert np.isfinite(float(m["loss_gen_total"]))


def test_cli_train_uint8_loader_display(workspace, tmp_path, monkeypatch):
    """MUNIT_LOADER_UINT8=1: display batches bypass device_prefetch (the
    normalization point for uint8 loaders), so cli.train's take() must
    normalize them itself — raw uint8 [0,255] into trainer.sample produced
    garbage/saturated sample grids (ADVICE r2, medium)."""
    import json

    ws, cpath = workspace
    conf = yaml.safe_load(open(cpath))
    conf.update({"max_iter": 2, "image_display_iter": 2,
                 "image_save_iter": 10, "snapshot_save_iter": 10})
    cpath2 = tmp_path / "tiny_u8.yaml"
    cpath2.write_text(yaml.safe_dump(conf))

    monkeypatch.setenv("MUNIT_LOADER_UINT8", "1")
    from munit_tpu.cli.train import main
    main(["--config", str(cpath2), "--output_path", str(tmp_path / "run8")])

    outdir = tmp_path / "run8" / "outputs" / "tiny_u8"
    lines = (outdir / "metrics.jsonl").read_text().strip().splitlines()
    assert any("loss_dis_total" in json.loads(l) for l in lines)
    grid = outdir / "images" / "gen_a2b_train_current.jpg"
    assert grid.exists()
    arr = np.asarray(Image.open(grid), np.float32)
    # a [0,255]-scaled input would tanh-saturate every generated column;
    # normalized inputs keep the grid's pixel spread healthy
    assert 5.0 < arr.mean() < 250.0
    sat = ((arr < 2) | (arr > 253)).mean()
    assert sat < 0.9, f"sample grid {sat:.0%} saturated — inputs unnormalized?"
