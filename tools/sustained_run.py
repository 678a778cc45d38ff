"""Sustained production-soak training run on the real TPU (VERDICT r4 #2).

Drives the SHIPPED production path end-to-end for thousands of iterations:
generated 256² toy data → cli/train at config_256 hyperparameters (full
cadence: dis/gen fused steps, sr-classifier updates, sample grids,
checkpoints, in-training FID with random inception weights) → SIGTERM
mid-run (graceful snapshot) → --resume → completion. Reports steady-state
throughput, HBM high-water, and the loss trajectory from metrics.jsonl.

  python tools/sustained_run.py --outdir /tmp/munit_soak --iters 5000 \
      --sigterm-at-step 2500

The reference's envelope is train.py:159-330 (1M iterations, restart by
hand); this proves the munit_tpu loop as a training SYSTEM, not a
150-iteration kernel benchmark.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import signal
import subprocess
import sys
import time

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))


def build_data(root: str, n_train: int, size: int):
    from quickstart import build_dataset
    lists = build_dataset(os.path.join(root, "data"), n_train, 8, size)
    return lists


def build_synth_data(root: str, n: int, size: int, seed=1):
    """Toy Unity-style 5-tuple set (VERDICT r4 #1): pixel-ALIGNED
    (normal, flooded) pairs from the same scene (the alignment-masked
    recon_synth loss needs identical pixels outside the flood), the flood
    mask, and semantic PNGs in the reference's grayscale value table
    (utils.py:1356-1366 — anything else fails the loader's strict LUT)."""
    from PIL import Image
    from quickstart import make_scene, flood

    rng = np.random.RandomState(seed)
    vals = np.array([0, 29, 55, 76, 133, 149, 178, 200, 255], np.uint8)
    for d in ("synth_a", "synth_b", "synth_mask", "synth_sem_a",
              "synth_sem_b"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    pa, pb, pm, psa, psb = [], [], [], [], []
    for i in range(n):
        scene = make_scene(rng, size)
        flooded, mask = flood(scene.copy(), rng)
        # blocky semantic map (NEAREST-safe): 16px cells of table values
        cells = vals[rng.randint(0, len(vals), (size // 16, size // 16))]
        sem_a = np.kron(cells, np.ones((16, 16), np.uint8))
        sem_b = sem_a.copy()
        sem_b[mask > 0.5] = 255   # flooded pixels → the water class value
        for arr, d, acc, u8 in (
                (scene, "synth_a", pa, False),
                (flooded, "synth_b", pb, False),
                (mask, "synth_mask", pm, False),
                (sem_a, "synth_sem_a", psa, True),
                (sem_b, "synth_sem_b", psb, True)):
            p = os.path.join(root, d, f"{i:04d}.png")
            img = arr if u8 else (arr * 255).astype(np.uint8)
            Image.fromarray(img).save(p)
            acc.append(p)
    lists = {}
    for name, paths in (("synth_a", pa), ("synth_b", pb),
                        ("synth_mask", pm), ("synth_sem_a", psa),
                        ("synth_sem_b", psb)):
        lists[name] = os.path.join(root, f"list_{name}.txt")
        with open(lists[name], "w") as f:
            f.write("\n".join(paths) + "\n")
    return lists


def write_fid_fixtures(root: str, lists):
    """Random-weight InceptionV3 variables + random PSD moments: makes the
    in-training FID hook execute its full path (translate → inception pool
    → Frechet) — the VALUE is meaningless without real weights
    (docs/REAL_WEIGHTS.md), the execution is what this run proves."""
    import jax
    import jax.numpy as jnp
    from munit_tpu.eval.inception import InceptionV3

    rng = np.random.RandomState(0)
    # FULL variables (params + BN batch_stats) — params alone crashes the
    # frozen-BN apply with ScopeCollectionNotFound
    variables = dict(InceptionV3().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))))
    inc_path = os.path.join(root, "inception_vars.pkl")
    with open(inc_path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, variables), f)
    a = rng.randn(2048, 2048) * 0.05
    moments = os.path.join(root, "moments.npz")
    np.savez(moments, mu=rng.randn(2048), sigma=a @ a.T / 2048)
    fid_list = os.path.join(root, "fid_pairs.txt")
    pa = open(lists["test_a"]).read().split()
    pb = open(lists["test_b"]).read().split()
    with open(fid_list, "w") as f:
        f.write("\n".join(f"{x} {y}" for x, y in zip(pa, pb)))
    return inc_path, moments, fid_list


def write_config(path, lists, inc, moments, fid_list, iters, batch, size,
                 snapshot_iter, tiny=False):
    base = yaml.safe_load(open(os.path.join(REPO, "configs",
                                            "config_256.yaml")))
    if tiny:  # CPU smoke of the orchestrator itself — never a perf claim
        base["gen"] = {"dim": 16, "mlp_dim": 32, "style_dim": 8,
                       "activ": "relu", "n_downsample": 2, "n_res": 2,
                       "pad_type": "reflect"}
        base["dis"] = {"dim": 16, "norm": "none", "activ": "lrelu",
                       "n_layer": 2, "gan_type": "lsgan", "num_scales": 2,
                       "pad_type": "reflect"}
        base["num_workers"] = 2
    base.update({
        "max_iter": iters, "batch_size": batch,
        "new_size": size, "crop_image_height": size,
        "crop_image_width": size,
        "log_iter": 10, "image_save_iter": snapshot_iter,
        "image_display_iter": snapshot_iter,
        "snapshot_save_iter": snapshot_iter,
        "display_size": 4,
        "eval_fid": 1, "batch_size_fid": 4,
        "inception_moment_path": moments,
        "inception_ckpt_path": inc,
        "data_list_fid_a": fid_list, "data_list_fid_b": fid_list,
        "semantic_ckpt_path": None,   # random frozen segmenter (warned)
        "data_folder_train_a": "/", "data_folder_train_b": "/",
        "data_folder_test_a": "/", "data_folder_test_b": "/",
        "data_list_train_a": lists["train_a"],
        "data_list_train_b": lists["train_b"],
        "data_list_test_a": lists["test_a"],
        "data_list_test_b": lists["test_b"],
        "data_list_train_a_mask": lists["train_mask"],
        "data_list_train_b_mask": lists["train_mask"],
    })
    for k in ("data_list_train_a_seg", "data_list_train_b_seg",
              "data_list_train_a_synth", "data_list_train_b_synth",
              "data_list_train_b_seg_synth", "seg_list_a", "seg_list_b"):
        base[k] = None
    with open(path, "w") as f:
        yaml.safe_dump(base, f)


def write_flavor_config(path, flavor, lists, synth_lists, inc, moments,
                        fid_list, iters, batch, size, snapshot_iter,
                        seghead=False, tiny=False):
    """Soak config for a configs/final_test grid flavor (VERDICT r4 #1):
    the flavor's own loss surface (FeatureDA sr classifiers / Output_DA
    sim-real discriminators / synthetic_seg_gt) at its shipped cadence
    (synthetic_frequency: 1, classif_frequency: 15 — reference
    configs/Final_test/*.yaml + train.py:229-283), pointed at the toy
    real+synthetic datasets. ``seghead=True`` additionally enables the
    segmentation-head update (sem_seg_lambda=1 — config-driven,
    trainer.py:1286-1324; no shipped grid config turns it on)."""
    base = yaml.safe_load(open(os.path.join(REPO, "configs", "final_test",
                                            flavor + ".yaml")))
    if seghead:
        base["adaptation"]["sem_seg_lambda"] = 1
    if tiny:  # CPU smoke of the orchestrator itself — never a perf claim
        base["gen"] = {"dim": 16, "mlp_dim": 32, "style_dim": 8,
                       "activ": "relu", "n_downsample": 2, "n_res": 2,
                       "pad_type": "reflect"}
        base["dis"] = {"dim": 16, "norm": "none", "activ": "lrelu",
                       "n_layer": 2, "gan_type": "lsgan", "num_scales": 2,
                       "pad_type": "reflect"}
        base["num_workers"] = 2
    base.update({
        "max_iter": iters, "batch_size": batch,
        "new_size": size, "crop_image_height": size,
        "crop_image_width": size,
        "log_iter": 10, "image_save_iter": snapshot_iter,
        "image_display_iter": snapshot_iter,
        "snapshot_save_iter": snapshot_iter,
        "display_size": 4, "num_workers": 8,
        "eval_fid": 1, "batch_size_fid": 4,
        "inception_moment_path": moments,
        "inception_ckpt_path": inc,
        "data_list_fid_a": fid_list, "data_list_fid_b": fid_list,
        "semantic_ckpt_path": None,   # random frozen segmenter (warned)
        "data_folder_train_a": "/", "data_folder_train_b": "/",
        "data_folder_test_a": "/", "data_folder_test_b": "/",
        "data_list_train_a": lists["train_a"],
        "data_list_train_b": lists["train_b"],
        "data_list_test_a": lists["test_a"],
        "data_list_test_b": lists["test_b"],
        "data_list_train_a_seg": lists["train_mask"],
        "data_list_train_b_seg": lists["train_mask"],
        "data_list_train_a_synth": synth_lists["synth_a"],
        "data_list_train_b_synth": synth_lists["synth_b"],
        "data_list_train_b_seg_synth": synth_lists["synth_mask"],
        "seg_list_a": synth_lists["synth_sem_a"],
        "seg_list_b": synth_lists["synth_sem_b"],
    })
    with open(path, "w") as f:
        yaml.safe_dump(base, f)


def _max_logged_step(outdir, name="soak_256"):
    path = os.path.join(outdir, "outputs", name, "metrics.jsonl")
    best = 0
    try:
        with open(path) as f:
            for line in f:
                try:
                    best = max(best, json.loads(line).get("step", 0))
                except Exception:
                    pass
    except FileNotFoundError:
        pass
    return best


def run_train(conf_path, outdir, resume, sigterm_at_step=None, timeout=3600,
              name="soak_256"):
    cmd = [sys.executable, "-m", "munit_tpu", "train", "--config", conf_path,
           "--output_path", outdir] + (["--resume"] if resume else [])
    env = dict(os.environ)
    # APPEND to PYTHONPATH: replacing it drops /root/.axon_site,
    # whose sitecustomize registers the axon TPU PJRT plugin
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    sent = False
    lines = []
    last_check = 0.0
    while True:
        line = proc.stdout.readline()
        if line:
            lines.append(line)
            if len(lines) % 20 == 0:
                print(f"  [train] {line.strip()[:140]}", flush=True)
        if proc.poll() is not None:
            break
        # progress-based preemption: SIGTERM only once the run has LOGGED
        # past the given step, so the signal always lands mid-training
        # (not mid-compile) and the graceful snapshot has state worth saving
        if (sigterm_at_step and not sent
                and time.time() - last_check > 5):
            last_check = time.time()
            if _max_logged_step(outdir, name) >= sigterm_at_step:
                print(f"== sending SIGTERM at t+{time.time() - t0:.0f}s "
                      f"(logged step >= {sigterm_at_step})", flush=True)
                proc.send_signal(signal.SIGTERM)
                sent = True
        if time.time() - t0 > timeout:
            proc.kill()
            raise RuntimeError("train phase exceeded timeout")
    rc = proc.wait()
    print(f"== phase done rc={rc} in {time.time() - t0:.0f}s "
          f"({len(lines)} log lines)", flush=True)
    if rc not in (0, -signal.SIGTERM):
        print("== phase FAILED; last lines:")
        for line in lines[-15:]:
            print("  " + line.rstrip()[:200])
    return rc, lines


def summarize(outdir, name):
    path = os.path.join(outdir, "outputs", name, "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    by_step = {}
    for r in rows:
        if "step" not in r:   # run-header rows (logged parameters)
            continue
        by_step.setdefault(r["step"], {}).update(r)
    steps = sorted(by_step)
    tput = [(s, by_step[s]["images_per_sec"]) for s in steps
            if "images_per_sec" in by_step[s]]
    # steady state: drop the first window (contains compile)
    steady = [v for _, v in tput[2:]] or [v for _, v in tput]
    peak = max((by_step[s].get("hbm_gb_peak", 0) for s in steps), default=0)
    fids = [(s, by_step[s]["FID"]) for s in steps if "FID" in by_step[s]]
    print(f"\n== SUMMARY ({len(steps)} logged steps, last={steps[-1]})")
    if steady:
        print(f"throughput: steady-state {np.median(steady):.1f} img/s "
              f"(min {min(steady):.1f}, max {max(steady):.1f}, "
              f"{len(tput)} windows)")
    print(f"HBM peak: {peak:.2f} GiB")
    for key in ("loss_gen_recon_x_a", "loss_gen_cycrecon_x_a",
                "loss_sem_seg", "loss_gen_total", "loss_dis_total"):
        series = [(s, by_step[s][key]) for s in steps if key in by_step[s]]
        if series:
            (s0, v0), (s1, v1) = series[0], series[-1]
            mid = series[len(series) // 2]
            print(f"{key}: {v0:.4f} @{s0} → {mid[1]:.4f} @{mid[0]} → "
                  f"{v1:.4f} @{s1}")
    if fids:
        print("FID(random-weights): " +
              ", ".join(f"{v:.1f}@{s}" for s, v in fids))
    grids = os.listdir(os.path.join(outdir, "outputs", name, "images")) \
        if os.path.isdir(os.path.join(outdir, "outputs", name, "images")) \
        else []
    ckpts = os.listdir(os.path.join(outdir, "outputs", name, "checkpoints")) \
        if os.path.isdir(os.path.join(outdir, "outputs", name,
                                      "checkpoints")) else []
    print(f"artifacts: {len(grids)} image files, {len(ckpts)} checkpoint "
          f"entries")
    return by_step, steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", required=True)
    p.add_argument("--iters", type=int, default=5000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--n-train", type=int, default=128)
    p.add_argument("--snapshot-iter", type=int, default=1000)
    p.add_argument("--sigterm-at-step", type=int, default=None,
                   help="send SIGTERM once phase 1 has logged this step")
    p.add_argument("--timeout", type=float, default=3600)
    p.add_argument("--tiny", action="store_true",
                   help="shrink the nets for a CPU smoke of this script")
    p.add_argument("--flavor", default=None,
                   help="soak a configs/final_test grid flavor (e.g. "
                        "FeatureDA+seg, Output_DA) instead of config_256: "
                        "builds the synthetic 5-tuple toy set and runs the "
                        "full adaptation cadence (VERDICT r4 #1)")
    p.add_argument("--seghead", action="store_true",
                   help="with --flavor: also enable the segmentation-head "
                        "update (sem_seg_lambda=1 override)")
    args = p.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    print("== building toy dataset...", flush=True)
    lists = build_data(args.outdir, args.n_train, args.size)
    inc, moments, fid_list = write_fid_fixtures(args.outdir, lists)
    if args.flavor:
        name = "soak_" + args.flavor + ("+seghead" if args.seghead else "")
        print("== building synthetic 5-tuple toy dataset...", flush=True)
        synth_lists = build_synth_data(os.path.join(args.outdir, "data"),
                                       args.n_train, args.size)
        conf_path = os.path.join(args.outdir, name + ".yaml")
        write_flavor_config(conf_path, args.flavor, lists, synth_lists, inc,
                            moments, fid_list, args.iters, args.batch,
                            args.size, args.snapshot_iter,
                            seghead=args.seghead, tiny=args.tiny)
    else:
        name = "soak_256"
        conf_path = os.path.join(args.outdir, "soak_256.yaml")
        write_config(conf_path, lists, inc, moments, fid_list, args.iters,
                     args.batch, args.size, args.snapshot_iter,
                     tiny=args.tiny)

    t_all = time.time()
    rc, _ = run_train(conf_path, args.outdir, resume=False,
                      sigterm_at_step=args.sigterm_at_step,
                      timeout=args.timeout, name=name)
    if args.sigterm_at_step:
        print("== resuming after SIGTERM...", flush=True)
        rc, _ = run_train(conf_path, args.outdir, resume=True,
                          timeout=args.timeout, name=name)
    print(f"== total wall {time.time() - t_all:.0f}s, final rc={rc}")
    summarize(args.outdir, name)


if __name__ == "__main__":
    main()
