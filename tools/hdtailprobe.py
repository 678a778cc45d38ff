"""HD decoder-tail lane-padding probe (the ROADMAP r4 lever).

At HD the decoder's last up stage materializes [8,512,512,128] (upsample)
and [8,512,512,64] (up-conv out) tensors; the 64-channel one wastes half of
every 128-lane register on every elementwise/norm op, and the out-conv's
s2d f=8 transposes move 512²-scale slabs. This probe keeps the whole tail
packed in s2d f=2 space:

  v0 (production): up2 -> pad -> conv5 (128->64 @512²) -> whole-LN -> relu
                   -> conv2d_s2d(7x7 64->3, f=8) -> [8,512²,3]
  v1 (packed):     phase-conv on the UN-upsampled x (upconvprobe tap
                   collapse) -> y4 [8,256²,256] (s2d-f2 of the up-conv out,
                   lane-full) -> LN stats/normalize/relu in packed space
                   (permutation-invariant; gamma tiled x4) -> pad 2 cells ->
                   s2d f=4 -> out-conv with the f=8 select kernel built on a
                   zero-extended k'=8 (same span 2, zero MAC penalty) and
                   the (p4,q4,r,s,c)->(p8,q8,c) channel permutation folded
                   in -> d2s f=8.

Borders are APPROXIMATE in v1 (reflect at source/cell granularity instead
of the upsampled-pixel reflect) — this is a TIMING probe; exact border
strips (upconvprobe style) only get built if the interior formulation wins.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/hdtailprobe.py
"""

import os
import time

import numpy as np

K = int(os.environ.get("BENCH_K", "2"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
B = int(os.environ.get("BENCH_BATCH", "8"))
H = int(os.environ.get("BENCH_H", "256"))  # source (pre-upsample) size
_EPS = 1e-5


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from munit_tpu.core import ops
    ops.set_conv_compute(jnp.bfloat16, lax.Precision.DEFAULT)

    cin, cmid, cout = 128, 64, 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, cin), jnp.bfloat16)
    kern5 = jnp.asarray(rng.randn(5, 5, cin, cmid) * 0.05, jnp.float32)
    bias5 = jnp.asarray(rng.randn(cmid) * 0.01, jnp.float32)
    gamma = jnp.asarray(rng.rand(cmid), jnp.float32)
    beta = jnp.asarray(0.01 * rng.randn(cmid), jnp.float32)
    kern7 = jnp.asarray(rng.randn(7, 7, cmid, cout) * 0.05, jnp.bfloat16)
    bias7 = jnp.asarray(rng.randn(cout) * 0.01, jnp.float32)
    kern1 = jnp.asarray(rng.randn(1, 1, cout, cin) * 0.3, jnp.bfloat16)
    n_ln = (2 * H) * (2 * H) * cmid

    def ln_relu(y, g, b):
        yf = y.astype(jnp.float32)
        axes = tuple(range(1, y.ndim))
        s1 = jnp.mean(yf, axis=axes, keepdims=True)
        s2 = jnp.mean(yf * yf, axis=axes, keepdims=True)
        var = jnp.maximum(s2 - s1 * s1, 0.0)
        std = jnp.sqrt(var * (n_ln / (n_ln - 1)))
        z = (yf - s1) / (std + _EPS) * g + b
        return jnp.maximum(z, 0.0).astype(jnp.bfloat16)

    # --- v0: production tail ---------------------------------------------
    def tail_v0(t):
        u = ops.upsample_nearest(t, 2)
        y = ops.conv2d(ops.pad2d(u, 2, "reflect"), kern5, None, 1)
        y = y + bias5.astype(y.dtype)
        z = ln_relu(y, gamma, beta)
        out = ops.conv2d_s2d(z, kern7, bias7, f=8)
        return out

    # --- v1: packed tail ---------------------------------------------------
    # phase-collapse selectors (upconvprobe): output phase r taps u<5 on the
    # upsampled grid collapse onto source offsets a in {0,1,2} of pad-1 x
    S0 = np.array([[1, 1, 0, 0, 0], [0, 0, 1, 1, 0], [0, 0, 0, 0, 1]],
                  np.float32)
    S1 = np.array([[1, 0, 0, 0, 0], [0, 1, 1, 0, 0], [0, 0, 0, 1, 1]],
                  np.float32)
    sel = [jnp.asarray(S0), jnp.asarray(S1)]
    kf5 = kern5.astype(jnp.float32)
    phase_kerns = []
    for r in range(2):
        for s in range(2):
            krs = jnp.einsum("at,bu,tuio->abio", sel[r], sel[s], kf5,
                             precision=lax.Precision.HIGHEST
                             ).astype(jnp.bfloat16)
            phase_kerns.append(krs)
    # one conv with 4x output channels: concat kernels on the output axis
    # -> y4 channels ordered (r, s, c) with c minor
    kern_phase = jnp.concatenate(phase_kerns, axis=-1)  # [3,3,cin,4*cmid]

    gamma4 = jnp.tile(gamma, 4)
    beta4 = jnp.tile(beta, 4)

    # out-conv kernel: zero-extend k 7->8 (prepend a zero row/col; effective
    # full-res pad becomes 4 = two f2 cells), build the standard f=8 select
    # kernel, then permute its input-channel axis from (p8,q8,c) to the
    # packed (p4,q4,rs,c) order with p8 = 2*p4 + r, q8 = 2*q4 + s
    kern8 = jnp.pad(kern7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    s8 = jnp.asarray(ops._s2d_select(8, 8), kern8.dtype)
    k2 = jnp.einsum("apru,bqsv,uvcn->abpqcrsn", s8, s8, kern8)
    span = s8.shape[0]
    k2 = k2.reshape(span, span, 64 * cmid, 64 * cout)
    perm = np.empty(64 * cmid, np.int64)
    for p4 in range(4):
        for q4 in range(4):
            for r in range(2):
                for s in range(2):
                    p8, q8 = 2 * p4 + r, 2 * q4 + s
                    src = (p8 * 8 + q8) * cmid
                    dst = ((p4 * 4 + q4) * 4 + (2 * r + s)) * cmid
                    perm[dst:dst + cmid] = np.arange(src, src + cmid)
    k2p = jnp.take(k2, jnp.asarray(perm), axis=2)

    def tail_v1(t):
        xp = ops.pad2d(t, 1, "reflect")
        y4 = ops.conv2d(xp, kern_phase, None, 1)       # [B,H,H,4*cmid]
        y4 = y4 + jnp.tile(bias5, 4).astype(y4.dtype)
        z4 = ln_relu(y4, gamma4, beta4)                # lane-full LN
        zp = ops.pad2d(z4, 2, "reflect")               # ~ full-res pad 4
        zs = ops.space_to_depth(zp, 4)                 # [B,(H+4)/4,...,16*256]
        y2 = ops.conv2d(zs, k2p, None, 1)              # span-2 -> [B,H/4,...]
        y2 = y2[:, :2 * H // 8, :2 * H // 8, :]
        out = ops.depth_to_space(y2, 8) + bias7
        return out

    # interior parity check (borders approximate by design)
    va = jax.jit(tail_v0)(x)
    vb = jax.jit(tail_v1)(x)
    m = 16  # trim the approximate border band
    d = float(jnp.max(jnp.abs(
        va[:, m:-m, m:-m, :].astype(jnp.float32)
        - vb[:, m:-m, m:-m, :].astype(jnp.float32))))
    print(f"interior parity max|Δ| = {d:.2e} (bf16 chain)", flush=True)

    def chain_time(name, tail, k=K, reps=REPS):
        def loss(t):
            for _ in range(k):
                out = tail(t)
                t = ops.conv2d(out, kern1, None, 2)    # close the loop
            return jnp.sum(t.astype(jnp.float32) ** 2)
        gfn = jax.jit(jax.grad(loss))
        r = gfn(x); float(r[0, 0, 0, 0])
        r = gfn(x); float(r[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(reps):
            r = gfn(x)
        float(r[0, 0, 0, 0])
        dt = (time.time() - t0) / (reps * k) * 1e3
        print(f"{name:24s} {dt:8.2f} ms/block", flush=True)
        return dt

    chain_time("v0 production tail", tail_v0)
    chain_time("v1 packed tail", tail_v1)
    chain_time("v0 re-measure", tail_v0)


if __name__ == "__main__":
    main()
