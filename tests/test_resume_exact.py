"""Resume correctness: an interrupted-and-resumed run reproduces the
uninterrupted run EXACTLY (state pytree carries rng + optimizer + ExtraAdam
snapshot — SURVEY.md §5.4's reference bugs are the motivation)."""

import numpy as np

import jax
import jax.numpy as jnp

from munit_tpu.config import validate
from munit_tpu.io.checkpoint import save_checkpoint, restore_checkpoint
from munit_tpu.train import MUNITTrainer

CROP = 32


def conf():
    return validate({
        "gen_state": 1, "guided": 1, "recon_mask": 0, "batch_size": 2,
        "optimizer": "extra_adam",   # exercises the snapshot state
        "crop_image_height": CROP, "crop_image_width": CROP, "new_size": CROP,
        "gen": {"dim": 16, "mlp_dim": 32, "style_dim": 8, "activ": "relu",
                "n_downsample": 2, "n_res": 2, "pad_type": "reflect"},
        "dis": {"dim": 16, "norm": "none", "activ": "lrelu", "n_layer": 3,
                "gan_type": "lsgan", "num_scales": 2, "pad_type": "reflect"},
    })


def batches(n):
    rng = np.random.RandomState(0)
    return [(jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32)),
             jnp.asarray(rng.randn(2, CROP, CROP, 3).astype(np.float32)))
            for _ in range(n)]


def run(tr, data, start, stop):
    for it in range(start, stop):
        tr.iterations = it
        x_a, x_b = data[it]
        tr.dis_update(x_a, x_b)
        if (it + 1) % 2 == 0:
            tr.gen_update(x_a, x_b)


def test_resume_reproduces_uninterrupted_run(tmp_path):
    data = batches(6)

    # uninterrupted
    tr_full = MUNITTrainer(conf(), jax.random.PRNGKey(7))
    run(tr_full, data, 0, 6)

    # interrupted at 3, checkpointed, resumed into a FRESH trainer
    tr_a = MUNITTrainer(conf(), jax.random.PRNGKey(7))
    run(tr_a, data, 0, 3)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, tr_a.state, step=3)

    tr_b = MUNITTrainer(conf(), jax.random.PRNGKey(99))  # different init
    state, step = restore_checkpoint(ckpt, tr_b.state)
    tr_b.state = state
    assert step == 3
    run(tr_b, data, 3, 6)

    for a, b in zip(jax.tree_util.tree_leaves_with_path(tr_full.state),
                    jax.tree_util.tree_leaves_with_path(tr_b.state)):
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]),
                                      err_msg=str(a[0]))


def test_resume_mid_extrapolation(tmp_path):
    """Checkpoint taken right after an EXTRAPOLATION half-step (even
    iteration): the anchor snapshot must survive the roundtrip so the
    following step() updates from the pre-extrapolation point — the reference
    loses params_copy on resume (SURVEY.md §5.4)."""
    data = batches(4)

    tr_full = MUNITTrainer(conf(), jax.random.PRNGKey(3))
    run(tr_full, data, 0, 3)  # iterations 0,1,2 — ends after extrapolation

    tr_a = MUNITTrainer(conf(), jax.random.PRNGKey(3))
    run(tr_a, data, 0, 3)
    assert bool(tr_a.state["dis_opt"].has_copy)  # mid-extrapolation
    ckpt = str(tmp_path / "ck2")
    save_checkpoint(ckpt, tr_a.state, step=3)

    tr_b = MUNITTrainer(conf(), jax.random.PRNGKey(77))
    state, _ = restore_checkpoint(ckpt, tr_b.state)
    tr_b.state = state
    assert bool(tr_b.state["dis_opt"].has_copy)

    run(tr_full, data, 3, 4)  # iteration 3 = step() from the anchor
    run(tr_b, data, 3, 4)
    for a, b in zip(jax.tree_util.tree_leaves_with_path(tr_full.state),
                    jax.tree_util.tree_leaves_with_path(tr_b.state)):
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]),
                                      err_msg=str(a[0]))
