"""REAL multi-process distributed test (SURVEY.md §5.8d).

Spawns two jax.distributed processes (4 fake CPU devices each, Gloo
collectives) that each hold only their per-host loader shard, assemble
global batches through the production ``device_prefetch`` path, and run the
jitted dis/gen steps with cross-process gradient psum. Updated params must
match a plain single-process unsharded run — the strongest validation of the
multi-host input + ICI/DCN story available without multi-host hardware.

The fake-mesh tests (tests/test_dist.py) cover the same math with
``process_count == 1``; only this test exercises
``jax.make_array_from_process_local_data`` with genuinely non-addressable
global arrays and collectives that cross a process boundary.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mp_worker

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 fake devices")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "MUNIT_FORCE_GLOBAL_BATCH"):
        env.pop(k, None)
    # workers own 4 fake CPU devices each; sitecustomize's axon override is
    # undone by mp_worker / by JAX_PLATFORMS before jax initializes
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "MUNIT_FORCE_GLOBAL_BATCH"):
        env.pop(k, None)
    worker = os.path.join(REPO, "tests", "mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:  # pragma: no cover
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n"
                    + "\n".join(o or "" for o in outs))
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{outs[i]}")

    got = {i: dict(np.load(tmp_path / f"params_{i}.npz")) for i in (0, 1)}

    # both processes observed the identical post-step state
    assert got[0].keys() == got[1].keys()
    for k in got[0]:
        np.testing.assert_array_equal(got[0][k], got[1][k], err_msg=k)

    # reference: the same global batch, unsharded, single process
    from munit_tpu.train import MUNITTrainer
    full = mp_worker.make_global_batch_np()
    tr = MUNITTrainer(mp_worker.tiny_conf(), jax.random.PRNGKey(mp_worker.KEY))
    tr.iterations = 0
    md = tr.dis_update(jnp.asarray(full["image_a"]),
                       jnp.asarray(full["image_b"]))
    mg = tr.gen_update(jnp.asarray(full["image_a"]),
                       jnp.asarray(full["image_b"]))

    np.testing.assert_allclose(float(md["loss_dis_total"]),
                               got[0]["metric:loss_dis_total"], rtol=1e-3)
    np.testing.assert_allclose(float(mg["loss_gen_total"]),
                               got[0]["metric:loss_gen_total"], rtol=1e-3)

    ref = {}
    for net in ("gen", "dis_a", "dis_b"):
        named = mp_worker.flatten_named(mp_worker.fetch_params(tr.state[net]))
        ref.update({f"{net}:{k}": v for k, v in named.items()})
    for k, v in ref.items():
        # same tolerance story as test_spatial_mesh_full_train_step_parity:
        # Adam normalizes gradient magnitude, so reduce-order epsilon on a
        # ~0 grad can flip one first step by ~2*lr; real assembly/psum bugs
        # are widespread and >> lr.
        np.testing.assert_allclose(got[0][k], v, rtol=1e-3, atol=2.5e-4,
                                   err_msg=k)


def _toy_workspace(tmp_path, batch_size):
    """Toy dataset + tiny config for the CLI run (per-host batch_size)."""
    import yaml
    from PIL import Image

    rng = np.random.RandomState(0)

    def write_list(name, n, size=40):
        paths = []
        for i in range(n):
            p = tmp_path / f"{name}_{i}.png"
            Image.fromarray(
                rng.randint(0, 255, (size, size, 3), np.uint8)).save(p)
            paths.append(str(p))
        lst = tmp_path / f"{name}.txt"
        lst.write_text("\n".join(paths))
        return str(lst)

    lists = {k: write_list(k, 8) for k in
             ("train_a", "train_b", "test_a", "test_b")}
    conf = {
        "new_size": 36, "crop_image_height": 32, "crop_image_width": 32,
        "gen_state": 1, "guided": 1, "semantic_w": 0, "recon_mask": 0,
        "gen": {"dim": 16, "mlp_dim": 32, "style_dim": 8, "activ": "relu",
                "n_downsample": 2, "n_res": 2, "pad_type": "reflect"},
        "dis": {"dim": 16, "norm": "none", "activ": "lrelu", "n_layer": 3,
                "gan_type": "lsgan", "num_scales": 2, "pad_type": "reflect"},
        "batch_size": batch_size, "display_size": 2, "max_iter": 4,
        "log_iter": 1, "image_save_iter": 2, "image_display_iter": 2,
        "snapshot_save_iter": 2, "ratio_disc_gen": 2, "num_workers": 1,
        "data_folder_train_a": "", "data_list_train_a": lists["train_a"],
        "data_folder_train_b": "", "data_list_train_b": lists["train_b"],
        "data_folder_test_a": "", "data_list_test_a": lists["test_a"],
        "data_folder_test_b": "", "data_list_test_b": lists["test_b"],
    }
    cpath = tmp_path / "tiny_mp.yaml"
    cpath.write_text(yaml.safe_dump(conf))
    return str(cpath)


def test_two_process_cli_train_end_to_end(tmp_path):
    """The full production launch story: two `cli.train --dist --mesh`
    processes train on per-host loader shards into ONE shared run dir —
    coordinated orbax checkpoints, lead-only metrics/images, global sample
    grids. (SURVEY §5.8d operationalized, not just the library path.)"""
    import json

    # per-host batch 4 → global batch 8 over the 8-device (2×4) mesh
    cpath = _toy_workspace(tmp_path, batch_size=4)
    port = _free_port()
    out = tmp_path / "run"
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "munit_tpu.cli.train",
             "--config", cpath, "--output_path", str(out),
             "--platform", "cpu", "--mesh",
             "--dist", f"localhost:{port},2,{i}"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            o, _ = p.communicate(timeout=900)
            outs.append(o)
    except subprocess.TimeoutExpired:  # pragma: no cover
        for p in procs:
            p.kill()
        pytest.fail("cli workers timed out:\n" + "\n".join(
            o or "" for o in outs))
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"cli worker {i} failed (rc={p.returncode}):\n{outs[i]}")

    run_dir = out / "outputs" / "tiny_mp"
    # lead-only metric stream, with every iteration logged
    metrics = [json.loads(l) for l in
               (run_dir / "metrics.jsonl").read_text().splitlines()]
    steps = [m["step"] for m in metrics if "loss_dis_total" in m]
    assert steps == [1, 2, 3, 4], steps
    # coordinated checkpoints at 2 and 4, restorable
    from munit_tpu.io.checkpoint import latest_step
    assert latest_step(str(run_dir / "checkpoints")) == 4
    # sample grids written once (by the lead)
    assert list((run_dir / "images").glob("gen_*train*")), \
        list((run_dir / "images").iterdir())
