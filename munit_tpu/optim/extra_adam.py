"""ExtraAdam — extragradient Adam as a pure functional transform.

Semantics of the reference (extraadam.py:14-168, driven by trainer.py:225-277):

- ``extrapolation()``: compute the Adam update from the gradient at the current
  point, SAVE a copy of the params (only on the first of consecutive
  extrapolations), then apply the update in place:  x_{t+1/2} = x_t - γ·F(x_t).
- ``step()``: compute the Adam update from the gradient at the *extrapolated*
  point but apply it to the SAVED params:  x_{t+1} = x_t - γ·F(x_{t+1/2});
  clear the copy.
- Adam moments/step-count advance on BOTH half-steps (shared state).
- Weight decay is L2-folded into the gradient at the evaluation point.
- The trainer alternates by global-iteration parity: even → extrapolation,
  odd → step (trainer.py:229).

Functional design (jit-friendly): state carries (count, mu, nu, params_copy,
has_copy); ``extrapolate`` is a traced bool so one compiled step handles both
phases via ``jnp.where``. The reference's un-checkpointed ``params_copy`` bug
(SURVEY.md §5.4) is fixed for free: the copy lives in the state pytree and is
checkpointed with it.

Deviation from the reference (documented): torch raises if ``step()`` is called
before any ``extrapolation()``; here a step without a saved copy degrades to a
plain Adam step (has_copy=False path), which keeps the transform total under jit.

The plain-Adam path (``optimizer: adam``) uses the same update with
extrapolate=False always, matching torch.optim.Adam with L2 weight decay.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ExtraAdamState(NamedTuple):
    count: jax.Array        # scalar int32 — Adam step count (both half-steps)
    mu: any                 # first moment
    nu: any                 # second moment
    params_copy: any        # snapshot at the anchor point
    has_copy: jax.Array     # scalar bool


def extra_adam_init(params) -> ExtraAdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return ExtraAdamState(
        count=jnp.zeros((), jnp.int32),
        mu=zeros,
        nu=jax.tree.map(jnp.zeros_like, params),
        params_copy=jax.tree.map(jnp.zeros_like, params),
        has_copy=jnp.zeros((), jnp.bool_),
    )


def extra_adam_update(grads, state: ExtraAdamState, params, lr,
                      extrapolate,
                      b1: float = 0.5, b2: float = 0.999, eps: float = 1e-8,
                      weight_decay: float = 0.0):
    """One half-step. Returns (new_params, new_state).

    lr: scalar (schedule applied by the caller per training iteration).
    extrapolate: traced bool — True for the even-iteration extrapolation phase.
    """
    count = state.count + 1
    bc1 = 1.0 - b1 ** count.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count.astype(jnp.float32)
    step_size = lr * jnp.sqrt(bc2) / bc1

    static_phase = isinstance(extrapolate, bool)

    def leaf(g, p, m, v, pc):
        if weight_decay:
            g = g + weight_decay * p
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        u = -step_size * m_new / (jnp.sqrt(v_new) + eps)
        if static_phase:
            # Python-bool phase (the trainer's even/odd parity is known at
            # trace time): emit ONLY the taken branch. On the update phase
            # new_pc is the input buffer unchanged, so with donated state
            # XLA aliases it instead of rewriting a full params copy — the
            # dual-path where() version measurably dominated the optimizer
            # fusions (BENCH.md r3 static-phase row).
            if extrapolate:
                new_p = p + u
                new_pc = jnp.where(state.has_copy, pc, p)
            else:
                new_p = jnp.where(state.has_copy, pc, p) + u
                new_pc = pc
            return new_p, m_new, v_new, new_pc
        # traced-bool fallback (one compiled step serves both phases)
        anchor = jnp.where(state.has_copy, pc, p)
        new_p = jnp.where(extrapolate, p + u, anchor + u)
        new_pc = jnp.where(extrapolate, anchor, pc)
        return new_p, m_new, v_new, new_pc

    # NOTE (perf, measured): a raveled single-vector variant of this update
    # (one fused elementwise op over a flat concat instead of ~100 per-leaf
    # ops) is bit-identical but 5% SLOWER end-to-end (98.3 → 93.4 img/s,
    # back-to-back bench) — the ravel/unravel concat copies cost more than
    # the per-leaf tiny-op overhead, which XLA overlaps well. Keep per-leaf.
    flat = jax.tree.map(leaf, grads, params, state.mu, state.nu,
                        state.params_copy)
    new_params = jax.tree.map(lambda t: t[0], flat,
                              is_leaf=lambda t: isinstance(t, tuple))
    mu = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
    nu = jax.tree.map(lambda t: t[2], flat, is_leaf=lambda t: isinstance(t, tuple))
    pc = jax.tree.map(lambda t: t[3], flat, is_leaf=lambda t: isinstance(t, tuple))

    new_state = ExtraAdamState(
        count=count, mu=mu, nu=nu, params_copy=pc,
        has_copy=jnp.asarray(extrapolate, jnp.bool_),
    )
    return new_params, new_state


def adam(grads, state: ExtraAdamState, params, lr,
         b1: float = 0.5, b2: float = 0.999, eps: float = 1e-8,
         weight_decay: float = 0.0):
    """Plain Adam (torch.optim.Adam semantics, L2-in-grad weight decay) using
    the same state container so the trainer is optimizer-agnostic."""
    return extra_adam_update(grads, state, params, lr,
                             extrapolate=False,
                             b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
