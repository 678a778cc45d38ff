"""Cadence parity: the loop calls exactly the updates the reference's
train.py:159-330 would, at the same iterations, with a spy trainer."""

import numpy as np

from munit_tpu.config import validate
from munit_tpu.train.loop import train_loop


class SpyTrainer:
    def __init__(self, conf):
        self.calls = []
        self.iterations = 0
        ad = conf["adaptation"]
        self.use_classifier_sr = ad["dfeat_lambda"] > 0
        self.use_output_classifier_sr = ad["output_classifier_lambda"] > 0
        self.train_seg = ad["sem_seg_lambda"] > 0
        self.state = {"gen": 0}

    def update_learning_rate(self):
        pass

    def _log(self, name):
        self.calls.append((self.iterations, name))
        return {}

    def dis_update(self, *a, **k):
        return self._log("dis")

    def gen_update(self, *a, synth=False, **k):
        return self._log("gen_synth" if synth else "gen")

    def domain_classifier_update(self, *a, **k):
        return self._log("dann")

    def domain_classifier_sr_update(self, *a, domain_synth=False, **k):
        return self._log("sr_synth" if domain_synth else "sr")

    def output_domain_classifier_sr_update(self, *a, **k):
        return self._log("out_sr")

    def segmentation_head_update(self, *a, **k):
        return self._log("seg_head")

    def sample(self, *a):
        return tuple(np.zeros((1, 4, 4, 3), np.float32) for _ in range(8))


class FakeLoader:
    def __init__(self, synth=False):
        self.synth = synth

    def __iter__(self):
        while True:
            if self.synth:
                yield {"image_a": np.zeros((1, 4, 4, 3), np.float32),
                       "image_b": np.zeros((1, 4, 4, 3), np.float32),
                       "mask": np.zeros((1, 4, 4, 1), np.float32),
                       "sem_a": np.zeros((1, 4, 4), np.int32),
                       "sem_b": np.zeros((1, 4, 4), np.int32)}
            else:
                yield {"image": np.zeros((1, 4, 4, 3), np.float32),
                       "mask": np.zeros((1, 4, 4, 1), np.float32)}


def run(conf_over, iters=6, synth_loader=True):
    conf = validate(dict({
        "ratio_disc_gen": 3, "log_iter": 100, "snapshot_save_iter": 1000,
        "image_save_iter": 1000, "image_display_iter": 1000,
    }, **conf_over))
    tr = SpyTrainer(conf)
    loaders = {"a": FakeLoader(), "b": FakeLoader()}
    if synth_loader:
        loaders["synth"] = FakeLoader(synth=True)
    train_loop(tr, conf, loaders, "/tmp/cadence_out", max_iter=iters)
    return tr.calls


def test_basic_cadence():
    calls = run({})
    # dis every iteration; gen when (it+1) % 3 == 0 (train.py:184)
    assert [it for it, n in calls if n == "dis"] == list(range(6))
    assert [it for it, n in calls if n == "gen"] == [2, 5]
    assert not any(n in ("dann", "sr", "out_sr") for _, n in calls)


def test_domain_adv_cadence():
    calls = run({"domain_adv_w": 1.0})
    assert [it for it, n in calls if n == "dann"] == list(range(6))


def test_sr_classifier_cadence():
    calls = run({"adaptation": {"dfeat_lambda": 1.0, "classif_frequency": 2}})
    # (it+1) % 2 == 0 (train.py:194-198)
    assert [it for it, n in calls if n == "sr"] == [1, 3, 5]


def test_synthetic_cadence():
    calls = run({"synthetic_frequency": 2, "synthetic_seg_gt": 1,
                 "adaptation": {"sem_seg_lambda": 1.0}})
    # synth dis+gen when it % 2 == 0 (train.py:230); seg head EVERY iteration
    # while synthetic_frequency > 0 (train.py:275 indentation)
    synth_gens = [it for it, n in calls if n == "gen_synth"]
    assert synth_gens == [0, 2, 4]
    assert [it for it, n in calls if n == "seg_head"] == list(range(6))
    # per synth iteration there are TWO dis calls (real + synthetic)
    dis_counts = {}
    for it, n in calls:
        if n == "dis":
            dis_counts[it] = dis_counts.get(it, 0) + 1
    assert dis_counts == {0: 2, 1: 1, 2: 2, 3: 1, 4: 2, 5: 1}


def test_output_sr_cadence():
    calls = run({"adaptation": {"output_classifier_lambda": 1.0,
                                "output_classif_freq": 3}})
    assert [it for it, n in calls if n == "out_sr"] == [2, 5]


def test_graceful_preemption_snapshots_and_stops(tmp_path):
    """SURVEY §5.3: when the stop event fires, the loop writes a full
    snapshot at the current iteration and returns (cli/train installs the
    event on SIGTERM/SIGINT; exact-resume fidelity is covered by
    tests/test_resume_exact.py)."""
    import os
    import threading

    from munit_tpu.train.loop import train_loop as _loop

    conf = validate({
        "ratio_disc_gen": 3, "log_iter": 100, "snapshot_save_iter": 1000,
        "image_save_iter": 1000, "image_display_iter": 1000,
    })
    stop = threading.Event()
    tr = SpyTrainer(conf)

    orig = tr.dis_update

    def dis_and_maybe_stop(*a, **k):
        out = orig(*a, **k)
        if tr.iterations == 3:
            stop.set()  # "SIGTERM" lands during iteration 3
        return out

    tr.dis_update = dis_and_maybe_stop
    out = str(tmp_path / "run")
    end = _loop(tr, conf, {"a": FakeLoader(), "b": FakeLoader()}, out,
                max_iter=100, stop=stop)
    assert end == 4  # stopped right after the interrupted iteration
    ckpts = os.listdir(os.path.join(out, "checkpoints"))
    assert any("4" in c for c in ckpts), ckpts


def test_nan_guard_aborts_with_pointer(monkeypatch):
    """A non-finite logged loss raises TrainingDiverged at the metric flush
    (the reference trains straight through NaNs); MUNIT_NAN_ABORT=0 restores
    the keep-going behavior."""
    import numpy as np
    import pytest
    from munit_tpu.train.loop import TrainingDiverged, _check_finite

    _check_finite({"loss_gen_total": 1.0}, 10)           # finite: no-op
    with pytest.raises(TrainingDiverged, match="loss_dis_total"):
        _check_finite({"loss_dis_total": float("nan"),
                       "loss_gen_total": 1.0}, 10)
    with pytest.raises(TrainingDiverged):
        _check_finite({"loss_gen_total": np.float32("inf")}, 10)
    monkeypatch.setenv("MUNIT_NAN_ABORT", "0")
    _check_finite({"loss_gen_total": float("nan")}, 10)  # opt-out


def test_snapshot_divergence_checks_before_commit(tmp_path):
    """A NaN sitting in the unflushed metric window must abort BEFORE the
    periodic snapshot commits poisoned state (the abort message points at
    'the last checkpoint' — it must never be the poisoned one)."""
    import os
    import pytest
    from munit_tpu.train.loop import TrainingDiverged

    conf = validate({
        "ratio_disc_gen": 3, "log_iter": 1, "snapshot_save_iter": 4,
        "image_save_iter": 1000, "image_display_iter": 1000,
    })
    tr = SpyTrainer(conf)
    orig = tr.dis_update

    def nan_dis(*a, **k):
        orig(*a, **k)
        bad = tr.iterations == 2
        return {"loss_dis_total": float("nan") if bad else 1.0}

    tr.dis_update = nan_dis
    out = str(tmp_path / "run")
    with pytest.raises(TrainingDiverged, match="loss_dis_total"):
        train_loop(tr, conf, {"a": FakeLoader(), "b": FakeLoader()}, out,
                   max_iter=100)
    # flush_every=100 means nothing flushed before the snapshot gate at
    # iteration 4 — the pre-snapshot check fired and NO checkpoint exists
    # (the writer was never even constructed, so the dir may be absent)
    ckpt_dir = os.path.join(out, "checkpoints")
    assert not os.path.exists(ckpt_dir) or os.listdir(ckpt_dir) == []
