"""LR schedule parity vs torch's stateful schedulers (lr_scheduler.py)."""
import numpy as np
import pytest

from synergize_motion_appearance_tpu.training import (
    cosine_annealing_restart_lr,
    multistep_lr,
    multistep_restart_lr,
)


def _torch_lrs(sched_ctor, base_lr, steps):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = sched_ctor(opt)
    lrs = []
    for _ in range(steps):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(lrs)


def test_multistep_restart_matches_torch_semantics():
    """Closed form == torch MultiStepRestartLR (models/lr_scheduler.py:6-33)
    reimplemented statefully here (the class itself is reference code)."""
    base, gamma = 1e-3, 0.5
    milestones = [5, 12, 20]
    restarts = [0, 10]
    weights = [1.0, 0.4]

    # stateful emulation of the reference get_lr
    lr, lrs = base, []
    for it in range(30):
        if it in restarts:
            lr = base * weights[restarts.index(it)]
        elif it in milestones:
            lr = lr * gamma
        lrs.append(lr)
    ref = np.asarray(lrs)

    sched = multistep_restart_lr(base, milestones, gamma, restarts, weights)
    ours = np.asarray([float(sched(i)) for i in range(30)])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_multistep_matches_torch():
    import torch

    base, gamma, milestones = 8e-5, 0.5, [200, 225]
    ref = _torch_lrs(
        lambda o: torch.optim.lr_scheduler.MultiStepLR(
            o, milestones=milestones, gamma=gamma),
        base, 300,
    )
    sched = multistep_lr(base, milestones, gamma)
    ours = np.asarray([float(sched(i)) for i in range(300)])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_cosine_restart_weights_reset():
    base = 1e-3
    sched = cosine_annealing_restart_lr(base, [10, 10],
                                        restart_weights=[1.0, 0.5])
    # start of each period hits base * weight
    np.testing.assert_allclose(float(sched(0)), base, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), base * 0.5, rtol=1e-6)
    # decays within the period
    assert float(sched(5)) < base
