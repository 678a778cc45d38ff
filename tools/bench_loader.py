"""Data-loader throughput benchmark: PIL chain vs native C++ fused path.

  python tools/bench_loader.py [n_images] [workers]

BENCH_NEWSIZE / BENCH_CROP override the 286/256 transform sizes (e.g.
600/512 for the config_HD envelope).
"""

import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    tmp = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(32):
        p = os.path.join(tmp, f"im{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (600, 800, 3), np.uint8)).save(p)
        paths.append(p)
    flist = os.path.join(tmp, "list.txt")
    with open(flist, "w") as f:
        f.write("\n".join(paths * (n // 32 + 1)))

    from munit_tpu.data import get_data_loader_mask_and_im

    new_size = int(os.environ.get("BENCH_NEWSIZE", "286"))
    crop = int(os.environ.get("BENCH_CROP", "256"))
    for native_flag in ("0", "1"):
        os.environ["MUNIT_NATIVE_IMAGEOPS"] = native_flag
        loader = get_data_loader_mask_and_im(
            flist, None, batch_size=8, train=True, new_size=new_size,
            height=crop, width=crop, num_workers=workers)
        it = iter(loader)
        next(it)  # warm
        t0 = time.time()
        seen = 0
        for batch in it:
            seen += batch["image"].shape[0]
            if seen >= n:
                break
        dt = time.time() - t0
        label = "native" if native_flag == "1" else "PIL"
        print(f"{label:>6}: {seen / dt:8.1f} images/sec "
              f"({workers} workers, 800x600 jpg -> resize {new_size} "
              f"-> {crop}^2 crop)")


if __name__ == "__main__":
    main()
