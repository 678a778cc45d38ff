"""ExtraAdam parity: munit_tpu.optim vs a torch reimplementation of the
extragradient-Adam semantics (extraadam.py:14-168), on a toy bilinear problem.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from munit_tpu.optim import extra_adam_init, extra_adam_update, adam
from munit_tpu.optim.schedule import step_lr


class TorchExtraAdam:
    """Reference-faithful extragradient Adam on a dict of torch tensors."""

    def __init__(self, params, lr, betas=(0.5, 0.999), eps=1e-8, wd=0.0):
        self.p = params
        self.lr, self.b1, self.b2, self.eps, self.wd = lr, betas[0], betas[1], eps, wd
        self.m = {k: torch.zeros_like(v) for k, v in params.items()}
        self.v = {k: torch.zeros_like(v) for k, v in params.items()}
        self.t = 0
        self.copy = None

    def _update(self, grads):
        self.t += 1
        out = {}
        for k, g in grads.items():
            g = g + self.wd * self.p[k]
            self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g
            self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g * g
            denom = self.v[k].sqrt() + self.eps
            step = self.lr * np.sqrt(1 - self.b2 ** self.t) / (1 - self.b1 ** self.t)
            out[k] = -step * self.m[k] / denom
        return out

    def extrapolation(self, grads):
        u = self._update(grads)
        if self.copy is None:
            self.copy = {k: v.clone() for k, v in self.p.items()}
        for k in self.p:
            self.p[k] = self.p[k] + u[k]

    def step(self, grads):
        u = self._update(grads)
        for k in self.p:
            self.p[k] = self.copy[k] + u[k]
        self.copy = None


def bilinear_grads_torch(p):
    # f(x, y) = x·y: grad_x = y, grad_y = -x (x minimizes, y maximizes)
    return {"x": p["y"].clone(), "y": -p["x"].clone()}


def bilinear_grads_jax(p):
    return {"x": p["y"], "y": -p["x"]}


def test_extra_adam_matches_torch_reference():
    lr, wd = 0.05, 0.01
    tp = {"x": torch.tensor([1.0, -2.0]), "y": torch.tensor([0.5, 1.5])}
    topt = TorchExtraAdam(dict(tp), lr, wd=wd)

    jp = {"x": jnp.asarray([1.0, -2.0]), "y": jnp.asarray([0.5, 1.5])}
    jstate = extra_adam_init(jp)

    for it in range(20):
        extrap = it % 2 == 0
        tg = bilinear_grads_torch(topt.p)
        if extrap:
            topt.extrapolation(tg)
        else:
            topt.step(tg)
        jg = bilinear_grads_jax(jp)
        jp, jstate = extra_adam_update(
            jg, jstate, jp, lr, jnp.asarray(extrap), b1=0.5, b2=0.999,
            weight_decay=wd)

    for k in jp:
        np.testing.assert_allclose(np.asarray(jp[k]), topt.p[k].numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_plain_adam_matches_torch():
    lr, wd = 0.01, 0.0001
    x0 = np.array([3.0, -1.0, 0.5], np.float32)
    tx = torch.tensor(x0, requires_grad=True)
    topt = torch.optim.Adam([tx], lr=lr, betas=(0.5, 0.999), eps=1e-8,
                            weight_decay=wd)

    jp = {"w": jnp.asarray(x0)}
    jstate = extra_adam_init(jp)

    for _ in range(25):
        topt.zero_grad()
        loss = (tx ** 2).sum()
        loss.backward()
        topt.step()
        jg = {"w": 2 * jp["w"]}
        jp, jstate = adam(jg, jstate, jp, lr, b1=0.5, b2=0.999,
                          weight_decay=wd)

    np.testing.assert_allclose(np.asarray(jp["w"]), tx.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_consecutive_extrapolations_keep_first_anchor():
    # extraadam.py:35-43: several extrapolations before a step must keep the
    # FIRST saved copy as the anchor.
    jp = {"w": jnp.asarray([1.0])}
    st = extra_adam_init(jp)
    g = {"w": jnp.asarray([1.0])}
    p1, st = extra_adam_update(g, st, jp, 0.1, jnp.asarray(True))
    anchor = np.asarray(st.params_copy["w"]).copy()
    np.testing.assert_allclose(anchor, [1.0])
    p2, st = extra_adam_update(g, st, p1, 0.1, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(st.params_copy["w"]), anchor)
    p3, st = extra_adam_update(g, st, p2, 0.1, jnp.asarray(False))
    assert not st.has_copy


def test_static_phase_bitwise_matches_traced():
    # The trainer passes `extrapolate` as a STATIC python bool (jit
    # specializes per phase; the update-phase params_copy is aliased).
    # Both code paths must produce bit-identical trajectories.
    rng = np.random.RandomState(7)
    p0 = {"w": jnp.asarray(rng.randn(5, 3), jnp.float32),
          "b": jnp.asarray(rng.randn(4), jnp.float32)}
    pj_s, st_s = p0, extra_adam_init(p0)
    pj_t, st_t = p0, extra_adam_init(p0)
    for it in range(6):
        g = jax.tree.map(
            lambda x: jnp.asarray(rng.randn(*x.shape), jnp.float32), p0)
        phase = it % 2 == 0
        pj_s, st_s = extra_adam_update(g, st_s, pj_s, 0.05, phase,
                                       weight_decay=1e-4)
        pj_t, st_t = extra_adam_update(g, st_t, pj_t, 0.05,
                                       jnp.asarray(phase),
                                       weight_decay=1e-4)
        for a, b in zip(jax.tree.leaves((pj_s, st_s)),
                        jax.tree.leaves((pj_t, st_t))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_lr_schedule():
    # Reference semantics: StepLR stepped at the START of every iteration, so
    # during iteration `it` it has been stepped it+1 times (train.py:172).
    sched = step_lr(1e-4, 100000, 0.5)
    assert sched(0) == 1e-4
    assert sched(99998) == 1e-4
    assert sched(99999) == 5e-5   # decay boundary: (99999+1)//100000 == 1
    assert sched(100000) == 5e-5
    assert sched(249999) == 2.5e-5


def test_step_lr_matches_torch_steplr():
    """Pin equality against real torch StepLR at every iteration incl. decay
    boundaries (reference train.py:172 steps the scheduler at iteration start).
    """
    lr0, step_size, gamma = 1e-4, 3, 0.5
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    sch = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size, gamma=gamma)
    sched = step_lr(lr0, step_size, gamma)
    for it in range(20):
        sch.step()  # update_learning_rate() at the start of iteration `it`
        assert abs(sched(it) - opt.param_groups[0]["lr"]) < 1e-15, it

