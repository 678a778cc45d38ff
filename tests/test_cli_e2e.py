"""End-to-end CLI tests: translate (test.py semantics) against a reference-
format .pt checkpoint produced by the torch mirror, checkpoint roundtrip,
and a short train_loop run on synthetic data."""

import os

import numpy as np
import pytest
import torch
import yaml
from PIL import Image

import jax
import jax.numpy as jnp

from tests import torch_mirror as tm

CROP = 32


@pytest.fixture
def tiny_config(tmp_path):
    conf = {
        "new_size": 64, "crop_image_height": CROP, "crop_image_width": CROP,
        "gen_state": 1, "guided": 1,
        "gen": dict(tm.small_gen_params()),
        "dis": dict(tm.small_dis_params()),
        "batch_size": 2, "display_size": 2, "semantic_w": 0, "recon_mask": 0,
        "max_iter": 4, "log_iter": 1, "image_save_iter": 1000,
        "image_display_iter": 1000, "snapshot_save_iter": 2,
        "ratio_disc_gen": 2,
    }
    path = tmp_path / "conf.yaml"
    path.write_text(yaml.safe_dump(conf))
    return str(path), conf


def save_mirror_ckpt(tmp_path, conf):
    torch.manual_seed(0)
    tgen = tm.MirrorAdaINGenDouble(3, conf["gen"]).eval()
    ckpt = tmp_path / "gen_00000001.pt"
    torch.save({"2": tgen.state_dict()}, ckpt)
    return tgen, str(ckpt)


def write_images(tmp_path, n=2, size=70):
    rng = np.random.RandomState(0)
    folder = tmp_path / "inputs"
    folder.mkdir(exist_ok=True)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)).save(
            folder / f"im{i}.png")
    style = tmp_path / "style.png"
    Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)).save(style)
    return str(folder) + "/", str(style)


def test_translate_cli_matches_torch_mirror(tmp_path, tiny_config):
    conf_path, conf = tiny_config
    tgen, ckpt = save_mirror_ckpt(tmp_path, conf)
    input_folder, style_path = write_images(tmp_path)
    out = tmp_path / "out"

    from munit_tpu.cli.translate import main
    main(["--config", conf_path, "--checkpoint", ckpt,
          "--input", input_folder, "--style", style_path,
          "--output_folder", str(out)])

    files = sorted(os.listdir(out))
    assert files == ["output000.jpg", "output001.jpg"]

    # parity: replicate the pipeline in torch on the first input
    from munit_tpu.data import transforms as T
    first_input = sorted(
        os.path.join(input_folder, f) for f in os.listdir(input_folder))[0]
    img = T.resize_shorter(Image.open(first_input).convert("RGB"), 64)
    sty = T.resize_shorter(Image.open(style_path).convert("RGB"), 64)
    to_t = lambda im: torch.from_numpy(
        np.transpose(T.normalize_pm1(T.to_array01(im)), (2, 0, 1)))[None]
    with torch.no_grad():
        _, s_b = tgen.encode(to_t(sty), 2)
        c_a, _ = tgen.encode(to_t(img), 1)
        want = tgen.decode(c_a, s_b, 2)
    want01 = (want[0].permute(1, 2, 0).numpy() + 1) / 2
    lo, hi = want01.min(), want01.max()
    want_u8 = (np.clip((want01 - lo) / max(hi - lo, 1e-5), 0, 1) * 255).round()

    # JPEG-roundtrip the expected image so compression loss (large on these
    # noise-like random-weight outputs) cancels; remaining diff is model diff.
    import io as _io
    buf = _io.BytesIO()
    Image.fromarray(want_u8.astype(np.uint8)).save(buf, format="JPEG")
    want_jpg = np.asarray(Image.open(buf)).astype(np.float32)
    got = np.asarray(Image.open(out / "output000.jpg")).astype(np.float32)
    assert np.mean(np.abs(got - want_jpg)) < 3.0


def test_checkpoint_roundtrip(tmp_path, tiny_config):
    _, conf = tiny_config
    from munit_tpu.config import validate
    from munit_tpu.train import MUNITTrainer
    from munit_tpu.io.checkpoint import save_checkpoint, restore_checkpoint

    tr = MUNITTrainer(validate(conf), jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32))
    tr.iterations = 0
    tr.dis_update(x, x)

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, tr.state, step=1)

    tr2 = MUNITTrainer(validate(conf), jax.random.PRNGKey(42))
    state, step = restore_checkpoint(ckpt_dir, tr2.state)
    assert step == 1
    for a, b in zip(jax.tree.leaves(tr.state), jax.tree.leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_train_loop_runs(tmp_path, tiny_config):
    conf_path, conf = tiny_config
    from munit_tpu.config import validate
    from munit_tpu.train import MUNITTrainer
    from munit_tpu.train.loop import train_loop
    from munit_tpu.data import get_data_loader_mask_and_im

    rng = np.random.RandomState(1)
    paths = []
    for i in range(4):
        p = tmp_path / f"t{i}.png"
        Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8)).save(p)
        paths.append(str(p))
    flist = tmp_path / "imgs.txt"
    flist.write_text("\n".join(paths))

    vconf = validate(conf)
    loader = lambda: get_data_loader_mask_and_im(
        str(flist), None, 2, True, new_size=40, height=CROP, width=CROP,
        num_workers=1)
    tr = MUNITTrainer(vconf, jax.random.PRNGKey(0))
    outdir = str(tmp_path / "run")
    end = train_loop(tr, vconf, {"a": loader(), "b": loader()}, outdir,
                     max_iter=4)
    assert end == 4
    assert os.path.exists(os.path.join(outdir, "metrics.jsonl"))
    # snapshot_save_iter=2 → checkpoints at steps 2 and 4
    from munit_tpu.io.checkpoint import latest_step
    assert latest_step(os.path.join(outdir, "checkpoints")) == 4


def test_translate_cli_accepts_reference_noop_flags(tmp_path, tiny_config):
    """Reference test.py invocations pass --synchronized / --output_path
    (test.py:28-42); both are dead at inference but must parse so migrating
    scripts run unchanged."""
    conf_path, conf = tiny_config
    _, ckpt = save_mirror_ckpt(tmp_path, conf)
    input_folder, style_path = write_images(tmp_path, n=1)
    out = tmp_path / "out_flags"

    from munit_tpu.cli.translate import main
    main(["--config", conf_path, "--checkpoint", ckpt,
          "--input", input_folder, "--style", style_path,
          "--output_folder", str(out),
          "--synchronized", "--output_path", str(tmp_path)])
    assert sorted(os.listdir(out)) == ["output000.jpg"]


def test_train_cli_trainer_flag(tiny_config):
    """`train --trainer <anything non-MUNIT>` exits with the reference's
    exact message (train.py:69-72 accepts any string and gates on equality —
    no argparse choices, so e.g. UNIT_Trainer behaves identically)."""
    conf_path, _ = tiny_config
    from munit_tpu.cli.train import main
    for name in ("UNIT", "UNIT_Trainer"):
        with pytest.raises(SystemExit, match="Only support MUNIT"):
            main(["--config", conf_path, "--trainer", name])
