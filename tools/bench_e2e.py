"""End-to-end training throughput: REAL input pipeline → TPU train steps.

Same compute workload as bench.py (full config_256 loss set, dis every iter +
gen every 5th) but fed by the actual decode→transform→device_prefetch chain
on a synthesized JPEG corpus (800×600 JPEGs + PNG masks → 286 resize → 256²
random crop), instead of device-resident synthetic batches. Reports img/s and
the delta vs the compute-only number (VERDICT r1 next-round #4).

  python tools/bench_e2e.py [--images 64] [--workers N]
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time

import numpy as np
from PIL import Image

os.environ.setdefault("MUNIT_PALLAS", "0")

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
CROP = 256
ITERS = int(os.environ.get("BENCH_ITERS", "30"))
WARMUP = 4


def make_corpus(n=64):
    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    rng = np.random.RandomState(0)
    img_paths, mask_paths = [], []
    for i in range(n):
        p = os.path.join(tmp, f"im{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (600, 800, 3), np.uint8)).save(
            p, quality=90)
        img_paths.append(p)
        mp = os.path.join(tmp, f"mask{i}.png")
        Image.fromarray((rng.rand(600, 800) > 0.5).astype(np.uint8) * 255
                        ).save(mp)
        mask_paths.append(mp)
    il = os.path.join(tmp, "imgs.txt")
    ml = os.path.join(tmp, "masks.txt")
    open(il, "w").write("\n".join(img_paths))
    open(ml, "w").write("\n".join(mask_paths))
    return il, ml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.config import validate
    from munit_tpu.core import ops
    from munit_tpu.data import get_data_loader_mask_and_im
    from munit_tpu.data.loader import device_prefetch
    from munit_tpu.train import MUNITTrainer

    ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)
    conf = validate({
        "gen_state": 1, "guided": 1, "semantic_w": 3, "recon_mask": 1,
        "batch_size": BATCH, "ratio_disc_gen": 5,
        "new_size": 286, "crop_image_height": CROP, "crop_image_width": CROP,
    })
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))

    il, ml = make_corpus(args.images)
    mk = lambda seed: device_prefetch(iter(get_data_loader_mask_and_im(
        il, ml, BATCH, True, new_size=286, height=CROP, width=CROP,
        num_workers=args.workers, seed=seed)), size=2)
    it_a, it_b = mk(0), mk(1)

    def one_iter(it):
        ba, bb = next(it_a), next(it_b)
        tr.iterations = it
        m = tr.dis_update(ba["image"], bb["image"])
        if (it + 1) % conf["ratio_disc_gen"] == 0:
            m = tr.gen_update(ba["image"], bb["image"],
                              ba["mask"], bb["mask"])
        return m

    def sync(m):
        return float(list(m.values())[0])

    print("compiling...", flush=True)
    sync(one_iter(0))
    sync(one_iter(conf["ratio_disc_gen"] - 1))
    for it in range(WARMUP):
        m = one_iter(it)
    sync(m)

    t0 = time.time()
    for it in range(WARMUP, WARMUP + ITERS):
        m = one_iter(it)
    sync(m)
    dt = time.time() - t0
    print(f"e2e: {ITERS} iters in {dt:.2f}s → "
          f"{BATCH * ITERS / dt:.1f} img/s ({args.workers} workers, "
          f"real JPEG decode + joint mask transform + device_prefetch)")


if __name__ == "__main__":
    main()
