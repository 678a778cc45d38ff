"""utils/misc.py (prepare_sub_folder, eformat, get_model_list —
reference utils.py:761-766, 887-908) and utils/logging.py::MetricLogger
(the comet-replacement metric stream, trainer.py:563-616 names)."""

import json
import os

import numpy as np

from munit_tpu.utils import (MetricLogger, Timer, eformat, get_model_list,
                             prepare_sub_folder)


def test_prepare_sub_folder(tmp_path):
    ckpt, img = prepare_sub_folder(str(tmp_path / "run"))
    assert os.path.isdir(ckpt) and ckpt.endswith("checkpoints")
    assert os.path.isdir(img) and img.endswith("images")
    # idempotent (resume re-calls it)
    assert prepare_sub_folder(str(tmp_path / "run")) == (ckpt, img)


def test_eformat():
    # reference semantics (utils.py:761-766): trimmed exponent digits
    assert eformat(0.0001, 1) == "1.0e-4"
    assert eformat(12345.0, 2) == "1.23e4"


def test_get_model_list(tmp_path):
    assert get_model_list(str(tmp_path / "missing"), "gen") is None
    d = tmp_path / "ckpts"
    d.mkdir()
    assert get_model_list(str(d), "gen") is None
    for step in (10, 2, 30):
        (d / f"gen_{step:08d}.pt").write_bytes(b"x")
    (d / "dis_00000099.pt").write_bytes(b"x")
    # lexicographically-last matching file (reference utils.py:887-908)
    assert get_model_list(str(d), "gen").endswith("gen_00000030.pt")
    assert get_model_list(str(d), "dis").endswith("dis_00000099.pt")


def test_metric_logger_jsonl_and_stdout(tmp_path, capsys):
    log = MetricLogger(output_dir=str(tmp_path), stdout=True)
    log.log_parameters({"lr": 1e-4, "batch_size": 8})
    log.log_metrics({"loss_gen_total": np.float32(2.5),
                     "loss_dis_total": 1.25}, step=100)
    out = capsys.readouterr().out
    assert "[100]" in out and "loss_gen_total=2.5000" in out

    lines = [json.loads(ln) for ln in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0] == {"parameters": {"lr": 1e-4, "batch_size": 8}}
    assert lines[1] == {"step": 100, "loss_gen_total": 2.5,
                        "loss_dis_total": 1.25}


def test_timer_disabled_is_silent(capsys):
    with Timer(enabled=False) as t:
        pass
    assert t.elapsed is not None and t.elapsed >= 0
    assert capsys.readouterr().out == ""
