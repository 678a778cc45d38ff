"""Observability: metric stream + wall-clock timer.

Replaces the reference's comet_ml coupling (train.py:55, trainer.py:563-616)
with a pluggable sink: stdout + JSONL always; comet/tensorboard attach if
available. Metric NAMES match the reference exactly (loss_gen_adv_a,
loss_dis_total, ...) for curve-level comparability.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, output_dir: Optional[str] = None, stdout: bool = True,
                 comet_experiment=None, tensorboard: bool = False,
                 enabled: bool = True):
        # enabled=False: a muted logger for non-lead processes in multi-host
        # training — every log_* call is a no-op and no file is touched, so
        # only process 0 owns the run's metric stream / images / comet.
        self.enabled = enabled
        self.stdout = stdout and enabled
        self.comet = comet_experiment if enabled else None
        self.jsonl = None
        self.tb = None
        if not enabled:
            return
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self.jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        if tensorboard and output_dir:
            # write_loss/tensorboardX in the reference was vestigial
            # (utils.py:837-846, no writer constructed); live here
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(os.path.join(output_dir, "tb"))
            except ImportError:
                pass

    def log_metrics(self, metrics: Dict, step: int):
        scalars = {k: float(v) for k, v in metrics.items()}
        if self.jsonl:
            self.jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
            self.jsonl.flush()
        if self.stdout:
            parts = " ".join(f"{k}={v:.4f}" for k, v in scalars.items())
            print(f"[{step}] {parts}", flush=True)
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)
        if self.comet is not None:
            for k, v in scalars.items():
                self.comet.log_metric(k, v, step=step)

    def log_image(self, path: str):
        if self.comet is not None:
            self.comet.log_image(path)

    def log_parameters(self, params: Dict):
        if self.jsonl:
            self.jsonl.write(json.dumps({"parameters": params}) + "\n")
            self.jsonl.flush()
        if self.comet is not None:
            self.comet.log_parameters(params)


class Timer:
    """Wall-clock context timer (utils.py:1118-1127). In timing mode the
    caller should block_until_ready the step outputs first — never in the hot
    loop (removes the reference's per-step cuda.synchronize, train.py:225)."""

    def __init__(self, msg: str = "Elapsed time in update s: %f",
                 enabled: bool = True):
        self.msg = msg
        self.enabled = enabled
        self.elapsed = None

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.start
        if self.enabled:
            print(self.msg % self.elapsed, flush=True)
