"""Training CLI (train.py semantics, /root/reference/scripts/train.py).

  python -m munit_tpu.cli.train --config configs/config_256.yaml \\
      [--output_path out] [--resume] [--mesh] [--time_steps]

Builds the masked A/B loaders + synthetic loader per config, snapshots the
config into the run dir, and drives the cadence loop. ``--mesh`` enables
data-parallel training over all visible devices.
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

import jax
import jax.numpy as jnp

from munit_tpu.config import get_config, flatten_opts
from munit_tpu.data import (
    get_all_data_loaders, get_data_loader_mask_and_im,
    get_synthetic_data_loader,
)
from munit_tpu.train import MUNITTrainer
from munit_tpu.train.loop import train_loop
from munit_tpu.utils import MetricLogger, prepare_sub_folder


def build_loaders(conf, seed=0, **shard):
    loaders = {}
    kw = dict(new_size=conf["new_size"], height=conf["crop_image_height"],
              width=conf["crop_image_width"], num_workers=conf["num_workers"],
              seed=seed, **shard)
    mask_a = conf.get("data_list_train_a_seg") if conf["semantic_w"] > 0 else None
    mask_b = conf.get("data_list_train_b_seg") if conf["semantic_w"] > 0 else None
    # distinct seeds per stream so A/B/synth shuffles are independent
    loaders["a"] = get_data_loader_mask_and_im(
        conf["data_list_train_a"], mask_a, conf["batch_size"], True,
        **{**kw, "seed": seed})
    loaders["b"] = get_data_loader_mask_and_im(
        conf["data_list_train_b"], mask_b, conf["batch_size"], True,
        **{**kw, "seed": seed + 1})
    if conf.get("data_list_train_a_synth") and \
            os.path.exists(str(conf["data_list_train_a_synth"])):
        loaders["synth"] = get_synthetic_data_loader(
            conf["data_list_train_a_synth"], conf["data_list_train_b_synth"],
            conf["data_list_train_b_seg_synth"], conf["seg_list_a"],
            conf["seg_list_b"], conf["batch_size"], True,
            **{**kw, "seed": seed + 2})
    if conf.get("eval_fid", 0) > 0 and conf.get("inception_moment_path") and \
            os.path.exists(str(conf["inception_moment_path"])):
        from munit_tpu.data import get_fid_data_loader
        loaders["fid"] = get_fid_data_loader(
            conf["data_list_fid_a"], conf["data_list_fid_b"],
            max(conf["batch_size_fid"], 1), new_size=conf["new_size"],
            num_workers=conf["num_workers"])
    return loaders


def attach_fid_metrics(conf, loaders, mesh=None):
    """In-training FID (reference train.py:119-130 prepared this and never
    called it; our loop's hook at train/loop.py snapshot time is live when
    this metric fn is attached). Needs converted InceptionV3 variables —
    path via conf["inception_ckpt_path"]. With a mesh (``--mesh``/``--dist``)
    the translate+inception step is sharded over the data axis — the same
    pipeline as `evaluate fid --mesh auto` — so multi-process runs compute
    FID in-training too (the fid loader is unsharded: every process reads
    the full list and contributes its slice of each global batch)."""
    if "fid" not in loaders:
        return
    ckpt = conf.get("inception_ckpt_path")
    if jax.process_count() > 1 and mesh is None:
        # host-local FID batches cannot join a multi-process computation
        # without a mesh to assemble global arrays on
        print("WARNING: in-training FID under --dist requires --mesh — "
              "disabled; use cli/evaluate fid offline")
    elif ckpt and os.path.exists(str(ckpt)):
        import pickle
        from munit_tpu.eval.fid import prepare_inception_metrics
        with open(str(ckpt), "rb") as f:
            variables = pickle.load(f)
        loaders["fid_metrics"] = prepare_inception_metrics(
            conf["inception_moment_path"], variables,
            use_jax=jax.default_backend() != "cpu", mesh=mesh)
    else:
        print("WARNING: eval_fid > 0 but inception_ckpt_path missing — "
              "in-training FID disabled")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--output_path", default=".")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--trainer", default="MUNIT",
                   help="reference train.py:45 flag; accepts any string but, "
                        "like the reference (train.py:69-72), every "
                        "non-MUNIT value exits 'Only support MUNIT' — UNIT "
                        "generators are inference-only "
                        "(translate_batch --trainer UNIT)")
    p.add_argument("--mesh", action="store_true",
                   help="data-parallel over all devices")
    p.add_argument("--platform", choices=["auto", "cpu"], default="auto",
                   help="force the CPU backend (overrides accelerator site "
                        "hooks — same as examples/quickstart.py)")
    p.add_argument("--dist", default=None, metavar="SPEC",
                   help="multi-host launch: 'auto' (cluster env auto-detect "
                        "— TPU pods, SLURM) or explicit "
                        "'coordinator:port,num_processes,process_id'. "
                        "Initializes jax.distributed; combine with --mesh. "
                        "Each process then loads a disjoint loader shard and "
                        "device_prefetch assembles global batches "
                        "(SURVEY §5.8d).")
    p.add_argument("--spatial", type=int, default=1,
                   help="spatial (H) mesh axis size for HD activation "
                   "sharding (implies --mesh); devices = data x spatial")
    p.add_argument("--time_steps", action="store_true")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture a jax.profiler trace of N steps (after a "
                        "2-step warmup) into <run>/trace")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--comet", action="store_true",
                   help="attach a comet_ml Experiment (train.py:55 parity)")
    p.add_argument("--project", default="munit-tpu")
    p.add_argument("--workspace", default=None)
    opts = p.parse_args(argv)

    if opts.trainer != "MUNIT":
        raise SystemExit("Only support MUNIT")   # reference train.py:72
    # Graceful preemption (SURVEY §5.3): install the SIGTERM/SIGINT handler
    # FIRST, so a preemption signal that lands during the minutes-scale
    # setup/compile phase still exits through the snapshot path (the loop
    # checks the event after its current iteration) instead of killing the
    # process before the handler exists.
    import signal
    import threading
    stop = threading.Event()

    def _on_signal(signum, frame):
        # Second signal = hard abort: restore the default handler so a user
        # stuck in the minutes-long setup/compile phase (where the loop's
        # stop-event check hasn't been reached yet) can still kill the
        # process with another Ctrl-C instead of needing SIGKILL.
        if stop.is_set():
            signal.signal(signum, signal.SIG_DFL)
            signal.raise_signal(signum)
        stop.set()
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except ValueError:
            pass  # not the main thread (e.g. driven from a test harness)
    if opts.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # Multi-host: join the cluster BEFORE any backend/device query (this
    # function is the first jax touch on the main path — module imports only
    # reference jax lazily). All later jax.process_count()/process_index()
    # checks in this file and train/loop.py key off the initialized cluster.
    if opts.dist:
        if opts.dist == "auto":
            jax.distributed.initialize()
        else:
            try:
                coord, nproc, pid = opts.dist.rsplit(",", 2)
                jax.distributed.initialize(coordinator_address=coord,
                                           num_processes=int(nproc),
                                           process_id=int(pid))
            except ValueError as e:
                raise SystemExit(
                    f"--dist {opts.dist!r}: expected 'auto' or "
                    f"'coordinator:port,num_processes,process_id' ({e})")
    lead = jax.process_index() == 0

    # Persistent compilation cache (same dirs as bench.py): a restarted or
    # resumed run loads the big step executables in seconds instead of
    # recompiling for minutes — the r4 soak's resume phase spent ~6 min
    # recompiling graphs the first phase had already built. MUNIT_JIT_CACHE
    # overrides the location; set it empty to disable.
    cache = os.environ.get("MUNIT_JIT_CACHE")
    if cache is None:
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        cache = os.path.join(
            repo, ".jax_cache" if jax.default_backend() != "cpu"
            else ".jax_cache_cpu")
    if cache:
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except OSError as e:   # read-only install dir etc. — run uncached
            print(f"WARNING: compile cache disabled ({e})")

    conf = get_config(opts.config)
    # training numerics (config `precision:`): "bf16" (default) = bf16 MXU
    # multiplies with f32 accumulate, norms/losses/optimizer in f32 — the
    # production mode every BENCH.md training number measures; "parity" /
    # "f32" = full-f32 HIGHEST-precision convs for golden comparisons
    # against the reference. Inference CLIs (translate/evaluate) always run
    # parity mode — their outputs are pixel-pinned against the reference.
    prec = str(conf.get("precision", "bf16")).lower()
    if prec in ("bf16", "bfloat16"):
        from munit_tpu.core import ops as _ops
        _ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)
    elif prec not in ("parity", "f32", "float32"):
        raise ValueError(f"unknown precision: {prec!r}")
    model_name = os.path.splitext(os.path.basename(opts.config))[0]
    output_directory = os.path.join(opts.output_path, "outputs", model_name)
    ckpt_dir, img_dir = prepare_sub_folder(output_directory)
    if lead:  # run-dir artifacts are process 0's (shared-FS multi-host safe)
        shutil.copy(opts.config, os.path.join(output_directory, "config.yaml"))

    comet_exp = None
    if opts.comet and lead:
        try:
            from comet_ml import Experiment
            comet_exp = Experiment(workspace=opts.workspace,
                                   project_name=opts.project)
        except ImportError:
            print("WARNING: comet_ml not installed; continuing without it")
    logger = MetricLogger(output_directory, comet_experiment=comet_exp,
                          enabled=lead)
    from munit_tpu.utils.misc import get_git_revision_hash
    params = dict(flatten_opts(conf))
    git_hash = get_git_revision_hash()
    if git_hash:
        params["git_hash"] = git_hash
    logger.log_parameters(params)

    # remat policy from the config: false/none | pads | hd | true/full
    # (HD 512² batch 8 ships wide: 0 + remat: true — the measured single-chip
    # fit, 20.3 img/s/chip; BENCH.md r3 HD table)
    remat = {"pads": "pads", "hd": "hd", "true": True, "full": True,
             "1": True}.get(str(conf.get("remat", "")).lower(), None)
    trainer = MUNITTrainer(conf, jax.random.PRNGKey(opts.seed), remat=remat)
    if conf["semantic_w"] > 0 and conf.get("semantic_ckpt_path") and \
            os.path.exists(str(conf["semantic_ckpt_path"])):
        from munit_tpu.io import load_torch_checkpoint
        from munit_tpu.nn.resnet import convert_resnet34_8s_state_dict
        import torch
        sd = {k: v.numpy() for k, v in torch.load(
            conf["semantic_ckpt_path"], map_location="cpu",
            weights_only=True).items()}
        trainer.load_segmenter(jax.tree.map(
            jnp.asarray, convert_resnet34_8s_state_dict(sd)))
    elif conf["semantic_w"] > 0:
        print("WARNING: semantic_ckpt_path missing — using random frozen "
              "segmenter weights (loss is well-defined but meaningless)")
        trainer.load_segmenter(trainer.seg_model_def.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, conf["crop_image_height"],
                       conf["crop_image_height"], 3))))
    if conf["vgg_w"] > 0:
        # Perceptual loss (reference's load_vgg16 was dead, utils.py:911-914;
        # live here): vgg_model_path points at a torchvision VGG16 state
        # dict (docs/REAL_WEIGHTS.md).
        vgg_path = conf.get("vgg_model_path")
        if vgg_path and not os.path.exists(str(vgg_path)):
            # An explicitly configured path that doesn't exist is a config
            # error (e.g. a typo), not a request for random weights — a
            # silent fallback would train to completion with a meaningless
            # perceptual loss term. The random fallback below is reserved
            # for the unset-path case (smoke tests, toy runs).
            raise SystemExit(
                f"vgg_w > 0 and vgg_model_path={vgg_path!r} does not exist; "
                "fix the path (docs/REAL_WEIGHTS.md) or unset "
                "vgg_model_path to opt into random-weight VGG16")
        if vgg_path:
            from munit_tpu.nn.vgg import convert_vgg16_state_dict
            import torch
            sd = {k: v.numpy() for k, v in torch.load(
                str(vgg_path), map_location="cpu",
                weights_only=True).items()}
            trainer.load_vgg(jax.tree.map(
                jnp.asarray, convert_vgg16_state_dict(sd)))
        else:
            from munit_tpu.nn.vgg import Vgg16
            print("WARNING: vgg_model_path missing — using random VGG16 "
                  "weights for the perceptual loss")
            trainer.load_vgg(Vgg16().init(
                jax.random.PRNGKey(2),
                jnp.zeros((1, conf["crop_image_height"],
                           conf["crop_image_height"], 3)))["params"])

    mesh = None
    if opts.mesh or opts.spatial > 1:
        from munit_tpu.dist import make_mesh
        from munit_tpu.dist.mesh import check_spatial_extent, replicate_state
        mesh = make_mesh(spatial=opts.spatial)
        check_spatial_extent(mesh, conf["crop_image_height"],
                             conf["gen"]["n_downsample"])
        trainer.state = replicate_state(mesh, trainer.state)
        # frozen nets are jit ARGUMENTS (not baked constants) — replicate
        # them onto the mesh alongside the state
        trainer.frozen = replicate_state(mesh, trainer.frozen)

    start = 0
    if opts.resume:
        from munit_tpu.io.checkpoint import resume
        start = resume(trainer, ckpt_dir)

    # multi-host: each process loads a disjoint shard of every epoch
    shard = {}
    if jax.process_count() > 1:
        shard = dict(shard_index=jax.process_index(),
                     shard_count=jax.process_count())
    loaders = build_loaders(conf, seed=opts.seed, **shard)
    attach_fid_metrics(conf, loaders, mesh=mesh)

    # display batches (train.py:132-143)
    display = int(conf["display_size"])
    skip_bad = os.environ.get("MUNIT_LOADER_SKIP_BAD", "0") == "1"

    def take(loader):
        n = len(loader.dataset)
        imgs, i = [], 0
        while len(imgs) < min(display, n) and i < n:
            try:
                imgs.append(
                    loader.dataset.get(i, np.random.default_rng(i))["image"])
            except Exception:
                # corrupt sample: skip it here too (loader.py
                # _load_or_substitute handles the training stream)
                if not skip_bad:
                    raise
                print(f"display batch: sample {i} failed; skipping")
            i += 1
        x = np.stack(imgs)
        if x.dtype == np.uint8:
            # uint8-mode loaders (MUNIT_LOADER_UINT8=1) are normalized in
            # device_prefetch; display batches bypass it, so normalize here.
            x = x.astype(np.float32) / 255.0 * 2.0 - 1.0
        return jnp.asarray(x)
    tloaders = get_all_data_loaders(conf, seed=opts.seed)
    display_batches = tuple(take(l) for l in tloaders)
    if mesh is not None and jax.process_count() > 1:
        # display loaders are NOT sharded, so every process built the same
        # arrays; sample() mixes them with the global replicated params, so
        # they must be global too (host-local arrays cannot join a
        # multi-process computation)
        from munit_tpu.dist.mesh import replicated
        rep = replicated(mesh)
        display_batches = tuple(
            jax.device_put(x, rep) for x in display_batches)

    # (stop event + SIGTERM/SIGINT handler installed at the top of main —
    # the loop snapshots the full trainer state on preemption and exits 0;
    # restart with --resume.)
    end = train_loop(trainer, conf, loaders, output_directory, logger,
                     start_iteration=start,
                     display_batches=display_batches,
                     mesh=mesh, time_steps=opts.time_steps,
                     profile=(start + 2, opts.profile) if opts.profile
                     else None, stop=stop)
    if stop.is_set():
        print(f"preempted at iteration {end}; state saved — "
              "restart with --resume to continue exactly")


if __name__ == "__main__":
    main()
