"""Worker process for tests/test_multiprocess.py — REAL multi-process
jax.distributed validation of the multi-host input path (SURVEY.md §5.8d).

Every other distributed test runs single-process on a fake 8-device mesh,
where ``jax.process_count() == 1`` and the global-array assembly in
``device_prefetch`` can only be forced (MUNIT_FORCE_GLOBAL_BATCH=1). This
script is launched TWICE by the parent test, each instance owning 4 fake CPU
devices, joined into one 8-device 2-process cluster via
``jax.distributed.initialize`` (Gloo CPU collectives). Each process builds
only its per-host loader shard — exactly what
``DataLoader(shard_index=process_index, shard_count=process_count)`` feeds in
production (cli/train.py) — and the production ``device_prefetch`` must
assemble the global arrays and the jitted steps must psum gradients across
the process boundary.

Run: python tests/mp_worker.py <proc_id> <port> <out_dir>
Writes <out_dir>/params_<proc_id>.npz with the updated params + metrics.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Shared by the parent test: the global batch both processes agree on, and
# the tiny config. Importable without initializing jax.
BATCH = 8  # global; 4 rows per process
CROP = 32
SEED = 7
KEY = 5


def make_global_batch_np():
    import numpy as np
    rng = np.random.RandomState(SEED)
    x_a = rng.randn(BATCH, CROP, CROP, 3).astype(np.float32) * 0.3
    x_b = rng.randn(BATCH, CROP, CROP, 3).astype(np.float32) * 0.3
    return {"image_a": x_a, "image_b": x_b}


def tiny_conf():
    from munit_tpu.config import validate
    return validate({
        "gen_state": 1, "guided": 1, "recon_mask": 0, "batch_size": BATCH,
        "crop_image_height": CROP, "crop_image_width": CROP, "new_size": CROP,
        "gen": {"dim": 16, "mlp_dim": 32, "style_dim": 8, "activ": "relu",
                "n_downsample": 2, "n_res": 2, "pad_type": "reflect"},
        "dis": {"dim": 16, "norm": "none", "activ": "lrelu", "n_layer": 3,
                "gan_type": "lsgan", "num_scales": 2, "pad_type": "reflect"},
    })


def fetch_params(tree):
    """Host copies of replicated global arrays (every process holds full
    addressable replicas)."""
    import jax
    import numpy as np

    def one(x):
        if hasattr(x, "addressable_data"):
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)
    return jax.tree.map(one, tree)


def flatten_named(tree):
    import jax
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(kp): v for kp, v in flat}


def main():
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    out_dir = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")  # sitecustomize override
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=proc_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4 and jax.device_count() == 8
    # same compile cache as the single-process suite (keyed by topology, so
    # no poisoning; repeated runs of this test skip the worker compiles)
    cache = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from munit_tpu.dist import make_mesh, data_sharding
    from munit_tpu.dist.mesh import replicate_state
    from munit_tpu.data.loader import device_prefetch
    from munit_tpu.train import MUNITTrainer

    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "spatial": 1}
    sharding = data_sharding(mesh)

    # this process's loader shard: rows [proc_id*4, proc_id*4+4) of the
    # agreed global batch — the shard_index=process_index convention
    full = make_global_batch_np()
    lo, hi = proc_id * (BATCH // 2), (proc_id + 1) * (BATCH // 2)
    local = {k: v[lo:hi] for k, v in full.items()}

    # the PRODUCTION assembly path: device_prefetch sees process_count 2 and
    # must route through dist.mesh.make_global_array
    stream = device_prefetch(iter([local]), size=1, sharding=sharding)
    batch = next(stream)
    for v in batch.values():
        assert v.shape[0] == BATCH, v.shape  # global, not local

    tr = MUNITTrainer(tiny_conf(), jax.random.PRNGKey(KEY))
    with mesh:
        tr.state = replicate_state(mesh, tr.state)
        tr.iterations = 0
        md = tr.dis_update(batch["image_a"], batch["image_b"])
        mg = tr.gen_update(batch["image_a"], batch["image_b"])

    out = {}
    for net in ("gen", "dis_a", "dis_b"):
        named = flatten_named(fetch_params(tr.state[net]))
        out.update({f"{net}:{k}": v for k, v in named.items()})
    out["metric:loss_dis_total"] = np.float32(float(md["loss_dis_total"]))
    out["metric:loss_gen_total"] = np.float32(float(mg["loss_gen_total"]))
    np.savez(os.path.join(out_dir, f"params_{proc_id}.npz"), **out)
    print(f"[mp_worker {proc_id}] OK", flush=True)


if __name__ == "__main__":
    main()
