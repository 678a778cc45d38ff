"""Training-loop driver: reference cadences (train.py:159-330) over the
jitted steps.

Cadence summary (config_256 defaults in parens):
- dis_update every iteration
- gen_update when (it+1) % ratio_disc_gen == 0 (5)
- domain_classifier_update every iteration if domain_adv_w > 0
- domain_classifier_sr_update when (it+1) % adaptation.classif_frequency == 0
- output_domain_classifier_sr_update when (it+1) % output_classif_freq == 0
- synthetic-pair dis+gen (+ sr-classifier) when synthetic_frequency > 0 and
  it % synthetic_frequency == 0; seg-head update every iteration in that mode
- sample grids at image_save_iter / image_display_iter; checkpoint at
  snapshot_save_iter

Deviation (documented): the reference's loop only runs when semantic_w != 0
(train.py:159) — generalized here to always run; the masked loaders simply
carry zero masks when semantic_w == 0.
"""

from __future__ import annotations

import itertools
import os
from typing import Optional

import jax
import numpy as np

from munit_tpu.eval.sample import write_2images
from munit_tpu.utils.logging import MetricLogger, Timer


def _dev(batch, key):
    import jax.numpy as jnp
    return jnp.asarray(batch[key])


class TrainingDiverged(RuntimeError):
    """A logged loss went NaN/Inf — the Adam state is poisoned and every
    later step is garbage; stop instead of silently training on."""


def trainer_device_memory_stats() -> Optional[dict]:
    """{hbm_gb_in_use, hbm_gb_peak} for device 0, or None when the backend
    exposes no memory_stats (CPU) or the query fails (tunnel hiccup)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats or "bytes_in_use" not in stats:
        return None
    out = {"hbm_gb_in_use": stats["bytes_in_use"] / 2**30}
    if "peak_bytes_in_use" in stats:
        out["hbm_gb_peak"] = stats["peak_bytes_in_use"] / 2**30
    return out


def _check_finite(metrics, step):
    """Divergence guard at the metric flush (zero extra device work — the
    scalars were just materialized for logging). The reference trains
    straight through NaNs; here a non-finite loss aborts with a pointer at
    the last good snapshot. MUNIT_NAN_ABORT=0 restores the reference's
    keep-going behavior."""
    if os.environ.get("MUNIT_NAN_ABORT", "1") != "1":
        return
    bad = [k for k, v in metrics.items() if not np.isfinite(float(v))]
    if bad:
        raise TrainingDiverged(
            f"non-finite loss at iteration {step}: {', '.join(sorted(bad))}. "
            "Training state is unrecoverable past this point; resume from "
            "the last checkpoint (--resume) with a lower lr or gan_w. "
            "Set MUNIT_NAN_ABORT=0 to continue anyway.")


def train_loop(trainer, conf, loaders, output_directory: str,
               logger: Optional[MetricLogger] = None,
               start_iteration: int = 0,
               max_iter: Optional[int] = None,
               display_batches=None,
               mesh=None,
               time_steps: bool = False,
               profile: Optional[tuple] = None,
               stop=None):
    """loaders: dict with 'a', 'b' (image+mask loaders) and optionally
    'synth'. display_batches: optional (train_a, train_b, test_a, test_b)
    numpy arrays for grid dumps. profile: optional (first_iteration,
    n_steps) window captured with jax.profiler into
    ``output_directory/trace`` (SURVEY §5.1). stop: optional
    threading.Event — graceful preemption (SURVEY §5.3): when set
    (cli/train installs it on SIGTERM/SIGINT), the loop snapshots the
    full trainer state and returns; ``--resume`` continues exactly
    (tests/test_resume_exact.py covers mid-extrapolation restores)."""
    # Multi-host: every process drives the identical loop (global-array
    # computations must be dispatched by all processes — including the
    # sample grids and the coordinated orbax saves), but run-dir artifacts
    # (metrics, images, html) belong to process 0 alone.
    lead = jax.process_index() == 0
    logger = logger or MetricLogger(output_directory, enabled=lead)
    ckpt_dir = os.path.join(output_directory, "checkpoints")
    img_dir = os.path.join(output_directory, "images")
    max_iter = max_iter or conf["max_iter"]
    ad = conf["adaptation"]
    display = int(conf["display_size"])

    from munit_tpu.data.loader import device_prefetch
    sharding = None
    if mesh is not None:
        from munit_tpu.dist import data_sharding
        sharding = data_sharding(mesh)
    # bf16 conv-compute mode → feed bf16 activations (half the activation
    # HBM traffic; the numerics every BENCH.md training number measures —
    # and the same step graphs bench.py warms the persistent cache with).
    # Keyed off the ACTUAL conv-compute state, not the config string:
    # train_loop can be driven directly without the CLI's set_conv_compute
    # call, and bf16 activations against f32 kernels is a dtype error.
    # masks/sem stay f32/int32 either way.
    from munit_tpu.core.ops import conv_compute_dtype
    act_dt = conv_compute_dtype()
    def _stream(loader):
        # exact data-order resume: the loop consumes exactly one batch per
        # loader per iteration, so a restore at start_iteration skips that
        # many batches (arithmetic only — loader.iter_from decodes nothing
        # for skipped batches). The reference restarted its data order on
        # --resume; see DataLoader.iter_from.
        if start_iteration and hasattr(loader, "iter_from"):
            src = loader.iter_from(start_iteration)
        else:
            src = iter(loader)
        return device_prefetch(src, size=2, sharding=sharding,
                               image_dtype=act_dt)

    it_a = _stream(loaders["a"])
    it_b = _stream(loaders["b"])
    it_s = _stream(loaders["synth"]) if loaders.get("synth") else None
    maybe_shard = (lambda x: x)  # prefetch already placed the arrays

    pending = []
    flush_every = max(1, 100 // max(conf["log_iter"], 1))
    ckpt_writer = None
    iterations = start_iteration
    profiling = False
    import time as _time
    tput_t0, tput_imgs = _time.monotonic(), 0

    def _flush_pending():
        """Log then divergence-check the buffered window. On divergence,
        finalize an active profiler trace and drain the async checkpoint
        writer BEFORE raising — the error message points the user at the
        last checkpoint, so its commit must have been awaited."""
        try:
            for step_, m_ in pending:
                logger.log_metrics(m_, step_)
            for step_, m_ in pending:
                _check_finite(m_, step_)
        except TrainingDiverged:
            if profiling:
                from munit_tpu.utils.profiling import stop_trace
                stop_trace()
            if ckpt_writer is not None:
                ckpt_writer.close()
            raise
        pending.clear()
    try:
        while iterations < max_iter:
            if profile is not None:
                if iterations == profile[0] and not profiling:
                    from munit_tpu.utils.profiling import start_trace
                    start_trace(os.path.join(output_directory, "trace"))
                    profiling = True
                elif profiling and iterations >= profile[0] + profile[1]:
                    from munit_tpu.utils.profiling import stop_trace
                    stop_trace()
                    profiling = False
            ba = maybe_shard(next(it_a))
            bb = maybe_shard(next(it_b))
            bs = maybe_shard(next(it_s)) if it_s else None
            trainer.iterations = iterations
            with Timer(enabled=time_steps):
                trainer.update_learning_rate()
                x_a, mask_a = _dev(ba, "image"), _dev(ba, "mask")
                x_b, mask_b = _dev(bb, "image"), _dev(bb, "mask")

                gen_iter = (iterations + 1) % conf["ratio_disc_gen"] == 0
                if gen_iter and getattr(trainer, "fused", False):
                    metrics = dict(trainer.dis_gen_update(x_a, x_b,
                                                          mask_a, mask_b))
                else:
                    metrics = dict(trainer.dis_update(x_a, x_b))
                    if gen_iter:
                        metrics.update(trainer.gen_update(x_a, x_b,
                                                          mask_a, mask_b))
                if conf["domain_adv_w"] > 0:
                    metrics.update(trainer.domain_classifier_update(x_a, x_b))
                if trainer.use_classifier_sr and \
                        (iterations + 1) % ad["classif_frequency"] == 0:
                    metrics.update(trainer.domain_classifier_sr_update(
                        x_a, x_b, domain_synth=False,
                        lamb=ad["dfeat_lambda"]))
                if bs is not None and trainer.use_output_classifier_sr and \
                        (iterations + 1) % ad["output_classif_freq"] == 0:
                    metrics.update(trainer.output_domain_classifier_sr_update(
                        x_a, _dev(bs, "image_a"), x_b, _dev(bs, "image_b")))

                if bs is not None and conf["synthetic_frequency"] > 0:
                    x_as, x_bs = _dev(bs, "image_a"), _dev(bs, "image_b")
                    mask_s = _dev(bs, "mask")
                    sem_a, sem_b = _dev(bs, "sem_a"), _dev(bs, "sem_b")
                    if iterations % conf["synthetic_frequency"] == 0:
                        gt = (None, None) if conf.get("synthetic_seg_gt", 0) == 0 \
                            else (sem_a, sem_b)
                        if getattr(trainer, "fused", False):
                            metrics.update(trainer.dis_gen_update(
                                x_as, x_bs, mask_s, mask_s, synth=True,
                                sem_gt_a=gt[0], sem_gt_b=gt[1]))
                        else:
                            metrics.update(trainer.dis_update(x_as, x_bs))
                            metrics.update(trainer.gen_update(
                                x_as, x_bs, mask_s, mask_s, synth=True,
                                sem_gt_a=gt[0], sem_gt_b=gt[1]))
                        if trainer.use_classifier_sr and \
                                (iterations + 1) % ad["classif_frequency"] == 0:
                            metrics.update(trainer.domain_classifier_sr_update(
                                x_as, x_bs, domain_synth=True,
                                lamb=ad["dfeat_lambda"]))
                    if trainer.train_seg:
                        metrics.update(trainer.segmentation_head_update(
                            x_as, x_bs, sem_a, sem_b))

                if time_steps:
                    jax.block_until_ready(trainer.state["gen"])

            tput_imgs += int(x_a.shape[0])
            if (iterations + 1) % conf["log_iter"] == 0:
                # buffer device scalars; materialize in batches so logging never
                # forces a per-iteration device sync (the reference synced every
                # step, train.py:225)
                pending.append((iterations + 1, metrics))
                if len(pending) >= flush_every:
                    _flush_pending()
                    # host-side throughput over the flushed window (includes
                    # compile time in the first window — observability, not a
                    # benchmark; bench.py owns the measured number)
                    dt = _time.monotonic() - tput_t0
                    if dt > 0:
                        logger.log_metrics(
                            {"images_per_sec": tput_imgs / dt}, iterations + 1)
                    tput_t0, tput_imgs = _time.monotonic(), 0
                    # HBM high-water observability (None on backends without
                    # memory_stats — e.g. CPU tests): peak_bytes_in_use tracks
                    # the whole process, so the max over the run is the train
                    # step + prefetch footprint.
                    stats = trainer_device_memory_stats()
                    if stats:
                        logger.log_metrics(stats, iterations + 1)

            if display_batches is not None:
                tr_a, tr_b, te_a, te_b = display_batches
                if (iterations + 1) % conf["image_save_iter"] == 0:
                    # sample() is a global computation (replicated params):
                    # ALL processes dispatch it; only the lead writes files
                    test_grid = trainer.sample(te_a, te_b)
                    train_grid = trainer.sample(tr_a, tr_b)
                    if lead:
                        write_2images(test_grid, display, img_dir,
                                      "test_%08d" % (iterations + 1), logger)
                        write_2images(train_grid, display, img_dir,
                                      "train_%08d" % (iterations + 1), logger)
                        from munit_tpu.utils.html import write_html
                        write_html(os.path.join(output_directory, "index.html"),
                                   iterations + 1, conf["image_save_iter"],
                                   img_dir)
                if (iterations + 1) % conf["image_display_iter"] == 0:
                    cur_grid = trainer.sample(tr_a, tr_b)
                    if lead:
                        write_2images(cur_grid, display, img_dir,
                                      "train_current", logger)

            if (iterations + 1) % conf["snapshot_save_iter"] == 0:
                # async: the D2H snapshot happens before save() returns; the
                # disk write overlaps subsequent train steps (MUNIT_ASYNC_CKPT=0
                # restores the blocking write)
                # divergence-check the buffered window BEFORE committing a
                # snapshot — a NaN that happened since the last flush must not
                # produce a poisoned checkpoint that the abort message then
                # calls "the last good one"
                _flush_pending()
                if ckpt_writer is None:
                    from munit_tpu.io.checkpoint import CheckpointWriter
                    ckpt_writer = CheckpointWriter(
                        ckpt_dir, keep=conf.get("snapshot_keep"),
                        async_io=os.environ.get("MUNIT_ASYNC_CKPT", "1") == "1")
                ckpt_writer.save(trainer.state, iterations + 1)
                # FID tracking (train.py:119-130 prepared this but never called
                # it — the hook is live here when eval_fid > 0 and the inception
                # metric fn was attached via loaders["fid_metrics"])
                if conf.get("eval_fid", 0) > 0 and loaders.get("fid_metrics"):
                    fid = loaders["fid_metrics"](trainer, loaders["fid"])
                    logger.log_metrics({"FID": fid}, iterations + 1)

            iterations += 1
            if stop is not None and stop.is_set():
                # divergence-check the unflushed window BEFORE the preemption
                # snapshot, so a poisoned state never overwrites the last good
                # checkpoint
                _flush_pending()
                if ckpt_writer is None:
                    from munit_tpu.io.checkpoint import CheckpointWriter
                    ckpt_writer = CheckpointWriter(
                        ckpt_dir, keep=conf.get("snapshot_keep"),
                        async_io=False)  # shutdown path: write synchronously
                ckpt_writer.save(trainer.state, iterations)
                logger.log_metrics({"preempted": 1.0}, iterations)
                break
    except BaseException:
        # ANY abnormal exit (not just divergence): drain the async
        # checkpoint writer before the interpreter starts shutting
        # down, or orbax's background commit dies with 'cannot
        # schedule new futures after interpreter shutdown' and the
        # snapshot is lost (caught by tools/sustained_run.py).
        if profiling:
            from munit_tpu.utils.profiling import stop_trace
            stop_trace()
        if ckpt_writer is not None:
            try:
                ckpt_writer.close()
            except Exception:
                pass
        raise
    if profiling:
        from munit_tpu.utils.profiling import stop_trace
        stop_trace()
    last_step = pending[-1][0] if pending else None
    _flush_pending()   # final window: logged AND divergence-checked
    if last_step is not None:
        dt = _time.monotonic() - tput_t0
        if dt > 0 and tput_imgs:
            logger.log_metrics({"images_per_sec": tput_imgs / dt}, last_step)
    if ckpt_writer is not None:
        ckpt_writer.close()   # drain pending async checkpoint writes
    return iterations
