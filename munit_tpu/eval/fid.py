"""FID: Newton-Schulz matrix sqrt in JAX (no eigendecomp — MXU-friendly),
mirroring inception_utils.py:90-308.

``prepare_inception_metrics`` reproduces the reference protocol: load the
precomputed real-data moments (.npz with mu/sigma of "900 flooded images",
configs/config_256.yaml:63-64), accumulate pool-3 activations of guided a→b
translations over the FID loader, and return FID.
"""

from __future__ import annotations

import functools
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_iters",))
def sqrt_newton_schulz(a: jax.Array, num_iters: int = 400) -> jax.Array:
    """Matrix square root via Newton-Schulz iteration
    (inception_utils.py:125-140; 400 iters at the call site :234).
    a: (D, D) symmetric PSD-ish. f32 throughout, matmuls on the MXU."""
    norm_a = jnp.sqrt(jnp.sum(a * a))
    y = a / norm_a
    eye = jnp.eye(a.shape[0], dtype=a.dtype)

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - z @ y)
        return y @ t, t @ z

    y, _ = jax.lax.fori_loop(0, num_iters, body, (y, eye))
    return y * jnp.sqrt(norm_a)


def cov(pool: jax.Array) -> jax.Array:
    """Sample covariance over rows (torch_cov rowvar=False semantics)."""
    m = pool - jnp.mean(pool, axis=0, keepdims=True)
    return (m.T @ m) / (pool.shape[0] - 1)


def frechet_distance(mu1, sigma1, mu2, sigma2, num_iters: int = 400) -> float:
    """FID via Newton-Schulz sqrt of sigma1·sigma2
    (torch_calculate_frechet_distance, inception_utils.py:206-241)."""
    mu1, mu2 = jnp.asarray(mu1), jnp.asarray(mu2)
    sigma1, sigma2 = jnp.asarray(sigma1), jnp.asarray(sigma2)
    diff = mu1 - mu2
    covmean = sqrt_newton_schulz(sigma1 @ sigma2, num_iters)
    out = (diff @ diff + jnp.trace(sigma1) + jnp.trace(sigma2)
           - 2.0 * jnp.trace(covmean))
    return float(out)


def frechet_distance_scipy(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Exact scipy-sqrtm FID (numpy_calculate_frechet_distance,
    inception_utils.py:145-203) with the same eps-jitter fallback."""
    from scipy import linalg
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    def _sqrtm(a):
        out = linalg.sqrtm(a)
        return out[0] if isinstance(out, tuple) else out

    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_fid_from_pools(pool_fake: np.ndarray, mu_real, sigma_real,
                           use_jax: bool = True) -> float:
    pool = jnp.asarray(pool_fake)
    mu = jnp.mean(pool, axis=0)
    sigma = cov(pool)
    if use_jax:
        fid = frechet_distance(mu, sigma, mu_real, sigma_real)
        if np.isfinite(fid):
            return fid
        # Newton-Schulz diverges on strongly rank-deficient covariance
        # products (pool count ≪ 2048) — same failure mode the reference
        # guards with its numpy path (inception_utils.py:145-203); fall
        # back to the exact scipy sqrtm with eps jitter.
    return frechet_distance_scipy(np.asarray(mu), np.asarray(sigma),
                                  np.asarray(mu_real), np.asarray(sigma_real))


def accumulate_activations(sample_fn: Callable, pool_fn: Callable,
                           fid_batches: Iterable) -> np.ndarray:
    """accumulate_inception_activations (inception_utils.py:246-254):
    translate each paired batch, run the inception pool head."""
    pools = []
    for batch in fid_batches:
        fake = sample_fn(jnp.asarray(batch["image_a"]),
                         jnp.asarray(batch["image_b"]))
        pools.append(np.asarray(pool_fn(fake)))
    return np.concatenate(pools, axis=0)


def prepare_inception_metrics(inception_moment_path: str,
                              inception_variables,
                              use_jax: bool = True,
                              mesh=None) -> Callable:
    """Reference protocol (inception_utils.py:258-308): returns
    get_inception_metrics(trainer, fid_loader) → FID. ``use_jax=False``
    selects the exact scipy sqrtm path (cheaper than 400 NS iterations on
    CPU hosts — tests).

    ``mesh``: shard the fused translate+inception step over the mesh's
    ``data`` axis (params/inception replicated, batches split — the same
    pipeline as ``cli/evaluate fid --mesh auto``). This is what makes
    in-training FID work under ``--dist``: the fid loader stays UNSHARDED
    (every process reads the identical full list, so all processes agree
    on the batch count — no cross-host length negotiation), each process
    donates its slice of every batch via ``make_global_array``, and the
    pool comes back fully replicated so each host materializes it locally.
    """
    from munit_tpu.eval.inception import InceptionV3, inception_preprocess
    moments = np.load(inception_moment_path)
    data_mu, data_sigma = moments["mu"], moments["sigma"]
    net = InceptionV3()

    if mesh is None:
        @jax.jit
        def pool_fn(img_pm1):
            pool, _ = net.apply(inception_variables,
                                inception_preprocess(img_pm1))
            return pool

        def get_inception_metrics(trainer, fid_loader, use_jax=use_jax):
            pool = accumulate_activations(trainer.sample_fid, pool_fn,
                                          fid_loader.batches())
            return compute_fid_from_pools(pool, data_mu, data_sigma, use_jax)

        return get_inception_metrics

    from munit_tpu.dist import mesh as M
    ds = M.data_sharding(mesh)
    rep = M.replicated(mesh)
    inception_variables = jax.device_put(inception_variables, rep)
    n_data = mesh.shape["data"]
    cache = {}

    def get_inception_metrics(trainer, fid_loader, use_jax=use_jax):
        if "step" not in cache:
            def _step(gen_params, x_a, x_b):
                # sample_fid semantics (trainer.py:1087-1131) fused with the
                # inception pool head in ONE sharded program
                c_a, _ = trainer.gen.encode(gen_params, x_a, 1)
                _, s_b = trainer.gen.encode(gen_params, x_b, 2)
                fake = trainer.gen.decode(gen_params, c_a, s_b, 2)
                pool, _ = net.apply(inception_variables,
                                    inception_preprocess(fake))
                return pool
            cache["step"] = jax.jit(_step, in_shardings=(rep, ds, ds),
                                    out_shardings=rep)
        step = cache["step"]
        pidx, pcnt = jax.process_index(), jax.process_count()
        pools = []
        for batch in fid_loader.batches():
            x_a = np.asarray(batch["image_a"], np.float32)
            x_b = np.asarray(batch["image_b"], np.float32)
            n = x_a.shape[0]
            # pad the (global) batch to a multiple of pcnt*n_data so every
            # process contributes an equal local shard and the data axis
            # divides evenly; the pad is sliced back off the pooled output
            g = pcnt * n_data
            full = -(-n // g) * g
            if full != n:
                pad = ((0, full - n),) + ((0, 0),) * (x_a.ndim - 1)
                x_a = np.pad(x_a, pad, mode="edge")
                x_b = np.pad(x_b, pad, mode="edge")
            per = full // pcnt
            ga = M.make_global_array(ds, x_a[pidx * per:(pidx + 1) * per])
            gb = M.make_global_array(ds, x_b[pidx * per:(pidx + 1) * per])
            pools.append(np.asarray(step(trainer.state["gen"], ga, gb))[:n])
        pool = np.concatenate(pools, axis=0)
        return compute_fid_from_pools(pool, data_mu, data_sigma, use_jax)

    return get_inception_metrics
