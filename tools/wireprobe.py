"""Tunnel H2D wire-bound arithmetic for the e2e training loop (VERDICT r4 #7).

The shipped CLI's e2e throughput on this host has been 48-57 img/s against
a ~122 img/s compute bound. This probe establishes whether that gap is a
schedulable pipeline bug or the closed-form ceiling of this host's H2D
wire, by measuring:

  1. raw tunnel H2D bandwidth, single stream (one device_put at a time,
     synced by a scalar fetch of a 1-element slice);
  2. aggregate bandwidth with TWO concurrent streams (the production
     loader topology: one pump thread per domain loader);
  3. the resulting closed-form bound for the config_256 pipeline
     (uint8 images + masks for both domains per iteration) against the
     compute-only step time.

  python tools/wireprobe.py

Output: one JSON line with all measurements + the bound.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("WIRE_BATCH", "8"))
CROP = int(os.environ.get("WIRE_CROP", "256"))
REPS = int(os.environ.get("WIRE_REPS", "6"))


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    # One loader draw's worth of uint8 payload: image (H,W,3) + mask (H,W).
    img = np.random.randint(0, 255, (BATCH, CROP, CROP, 3), np.uint8)
    msk = np.random.randint(0, 2, (BATCH, CROP, CROP), np.uint8)
    per_loader = img.nbytes + msk.nbytes
    per_iter = 2 * per_loader          # two domains per training iteration

    def put_pair():
        di = jax.device_put(img, dev)
        dm = jax.device_put(msk, dev)
        # sync via a tiny scalar fetch (block_until_ready unreliable over
        # the tunnel — ROADMAP operational notes)
        float(jnp.sum(di[0, 0, 0].astype(jnp.float32)))
        float(jnp.sum(dm[0, 0, 0].astype(jnp.float32)))

    # warm the dispatch path
    put_pair()

    # 1. single stream
    t0 = time.time()
    for _ in range(REPS):
        put_pair()
    dt1 = time.time() - t0
    mbs_1 = per_loader * REPS / dt1 / 1e6

    # 2. two concurrent streams (production pump-thread topology)
    def stream():
        for _ in range(REPS):
            put_pair()

    threads = [threading.Thread(target=stream) for _ in range(2)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt2 = time.time() - t0
    mbs_2 = 2 * per_loader * REPS / dt2 / 1e6

    # 3. closed-form bound vs the compute-only step
    compute_step_s = BATCH / float(os.environ.get("WIRE_COMPUTE_IPS", "121.9"))
    wire_iter_s = per_iter / (mbs_2 * 1e6)
    bound_ips = BATCH / max(wire_iter_s, compute_step_s)

    print(json.dumps({
        "bytes_per_loader_draw": per_loader,
        "bytes_per_iter": per_iter,
        "h2d_single_stream_MBps": round(mbs_1, 2),
        "h2d_two_stream_aggregate_MBps": round(mbs_2, 2),
        "wire_s_per_iter_at_2stream": round(wire_iter_s, 4),
        "compute_s_per_iter": round(compute_step_s, 4),
        "wire_bound_img_per_s": round(BATCH / wire_iter_s, 2),
        "pipeline_bound_img_per_s": round(bound_ips, 2),
    }))


if __name__ == "__main__":
    main()
