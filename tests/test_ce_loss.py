"""Cross-entropy parity vs torch (unit-level).

The r2 perf rewrite replaced take_along_axis with a one-hot
compare+reduce (losses.cross_entropy_loss) — pin its values against
torch F.cross_entropy, and the mask-as-extra-logit-channel construction
(semantic_seg_loss_masked) against a direct torch replication of the
reference's trainer.py:744-767 semantics.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from munit_tpu.losses.losses import (cross_entropy_loss,
                                     semantic_seg_loss_masked)


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 5, 7, 11).astype(np.float32) * 3
    labels = rng.randint(0, 11, (2, 5, 7))
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels)).item()
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_semantic_ce_matches_torch_construction():
    """Reference semantics (trainer.py:744-767): masked pixels get label
    n_cls ('unknown'), logits are zeroed there, and the mask rides as the
    extra logit channel."""
    rng = np.random.RandomState(1)
    n_cls = 19
    logits = rng.randn(2, 8, 8, n_cls).astype(np.float32)
    target = rng.randint(0, n_cls, (2, 8, 8))
    mask = (rng.rand(2, 8, 8) > 0.5).astype(np.float32)

    # torch replication
    t_logits = torch.from_numpy(logits)
    t_mask = torch.from_numpy(mask)
    t_target = torch.from_numpy(target).long()
    t_target = ((1 - t_mask.long()) * t_target + t_mask.long() * n_cls)
    masked = t_logits * (1.0 - t_mask)[..., None]
    cat = torch.cat([masked, t_mask[..., None]], dim=-1)
    want = F.cross_entropy(cat.permute(0, 3, 1, 2), t_target).item()

    got = float(semantic_seg_loss_masked(
        jnp.asarray(logits), jnp.asarray(target), jnp.asarray(mask), n_cls))
    np.testing.assert_allclose(got, want, rtol=1e-5)
