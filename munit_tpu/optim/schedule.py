"""Learning-rate schedules.

The reference uses torch StepLR stepped once at the START of every training
iteration (utils.py:1035-1060; train.py:172), so during 0-based iteration
``it`` the scheduler has been stepped ``it+1`` times and the lr in effect is
lr(it) = lr0 * gamma^((it + 1) // step_size) — torch-pinned in
tests/test_optim.py::test_step_lr_matches_torch_steplr, including the decay
boundaries. ``lr_policy: constant`` → no decay.
"""

from __future__ import annotations


def step_lr(lr0: float, step_size: int, gamma: float):
    def schedule(iteration: int) -> float:
        return lr0 * (gamma ** ((iteration + 1) // step_size))
    return schedule


def from_config(hp: dict):
    policy = hp.get("lr_policy", "constant")
    lr0 = hp["lr"]
    if policy == "constant":
        return lambda it: lr0
    if policy == "step":
        return step_lr(lr0, hp["step_size"], hp["gamma"])
    raise NotImplementedError(f"learning rate policy [{policy}] is not implemented")
