"""End-to-end training throughput: real input pipeline feeding the TPU.

Unlike bench.py (device-resident synthetic batches = pure compute), this
drives the full chain the reference uses in production
(utils.py:638-677 loader semantics): JPEG decode -> joint flip/resize/crop
-> normalize on host worker threads -> bounded prefetch queue ->
device_prefetch (H2D overlap) -> the jitted dis / fused dis+gen steps.

Target (VERDICT r1 #4): e2e img/s within ~5% of bench.py's compute-only
number, proving the input pipeline is not the bottleneck.

  python tools/bench_e2e.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MUNIT_PALLAS", "0")
# Production loader fast path on the 1-core host: decoded-image RAM cache +
# uint8 H2D + on-device normalize (BENCH.md r2). BENCH_SLOW_LOADER=1 measures
# the decode-per-draw float path instead.
if os.environ.get("BENCH_SLOW_LOADER", "0") != "1":
    os.environ.setdefault("MUNIT_LOADER_UINT8", "1")
else:
    os.environ["MUNIT_CACHE_MB"] = "0"

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
ITERS = int(os.environ.get("BENCH_ITERS", "100"))
WARMUP = 10
CROP = 256
N_IMAGES = 64          # distinct source JPEGs per domain
WORKERS = int(os.environ.get("BENCH_WORKERS", "8"))
# device_prefetch queue depth — sweep this (VERDICT r2 #9) to show whether
# deeper H2D pipelining converges e2e toward compute-only or the wire is
# the irreducible residual at this host's H2D bandwidth.
PREFETCH = int(os.environ.get("BENCH_PREFETCH", "2"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_corpus(tmp, tag, rng):
    """Distinct 800x600 JPEGs + binary mask PNGs, reference-style lists."""
    img_paths, mask_paths = [], []
    for i in range(N_IMAGES):
        p = os.path.join(tmp, f"{tag}_im{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (600, 800, 3), np.uint8)).save(
            p, quality=92)
        img_paths.append(p)
        m = os.path.join(tmp, f"{tag}_mask{i}.png")
        Image.fromarray((rng.rand(600, 800) > 0.5).astype(np.uint8)).save(m)
        mask_paths.append(m)
    il = os.path.join(tmp, f"{tag}_images.txt")
    ml = os.path.join(tmp, f"{tag}_masks.txt")
    with open(il, "w") as f:
        f.write("\n".join(img_paths))
    with open(ml, "w") as f:
        f.write("\n".join(mask_paths))
    return il, ml


def main():
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

    conf = validate({
        "gen_state": 1, "guided": 1, "semantic_w": 3, "recon_mask": 1,
        "batch_size": BATCH, "ratio_disc_gen": 5,
        "new_size": CROP, "crop_image_height": CROP, "crop_image_width": CROP,
    })
    if os.environ.get("BENCH_BF16", "1") == "1":
        ops.set_conv_compute(jnp.bfloat16, jax.lax.Precision.DEFAULT)
    tr = MUNITTrainer(conf, jax.random.PRNGKey(0))
    tr.load_segmenter(tr.seg_model_def.init(
        jax.random.PRNGKey(1), jnp.zeros((1, CROP, CROP, 3))))

    tmp = tempfile.mkdtemp(prefix="munit_e2e_")
    rng = np.random.RandomState(0)
    il_a, ml_a = make_corpus(tmp, "a", rng)
    il_b, ml_b = make_corpus(tmp, "b", rng)
    mk = lambda il, ml, seed: get_data_loader_mask_and_im(
        il, ml, batch_size=BATCH, train=True, new_size=286, height=CROP,
        width=CROP, num_workers=WORKERS, seed=seed)
    act = jnp.bfloat16 if os.environ.get("BENCH_ACT_BF16", "1") == "1" \
        else jnp.float32
    it_a = device_prefetch(mk(il_a, ml_a, 1), size=PREFETCH, image_dtype=act)
    it_b = device_prefetch(mk(il_b, ml_b, 2), size=PREFETCH, image_dtype=act)

    def one_iter(it):
        tr.iterations = it
        a, b = next(it_a), next(it_b)
        x_a = a["image"].astype(act)
        x_b = b["image"].astype(act)
        if (it + 1) % conf["ratio_disc_gen"] == 0 and tr.fused:
            return tr.dis_gen_update(x_a, x_b, a["mask"], b["mask"])
        m = tr.dis_update(x_a, x_b)
        if (it + 1) % conf["ratio_disc_gen"] == 0:
            m = tr.gen_update(x_a, x_b, a["mask"], b["mask"])
        return m

    def sync(m):
        return float(list(m.values())[0])

    log("bench_e2e: compiling...")
    sync(one_iter(0))
    sync(one_iter(conf["ratio_disc_gen"] - 1))
    log("bench_e2e: warmup...")
    for it in range(WARMUP):
        m = one_iter(it)
    sync(m)

    t0 = time.time()
    for it in range(WARMUP, WARMUP + ITERS):
        m = one_iter(it)
    sync(m)
    dt = time.time() - t0
    log(f"bench_e2e: {ITERS} iters in {dt:.2f}s")
    images_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "munit_256_train_images_per_sec_e2e",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "prefetch_depth": PREFETCH,
        "pipeline": (
            f"jpeg->flip/resize/crop->normalize ({WORKERS} threads) "
            f"->prefetch->H2D->train"
            if os.environ.get("BENCH_SLOW_LOADER") == "1" else
            f"jpeg decode+resize (RAM-cached) -> crop/flip uint8 "
            f"({WORKERS} threads) -> prefetch -> H2D -> device normalize "
            f"-> train"),
    }))


if __name__ == "__main__":
    main()
