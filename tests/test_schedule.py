"""StepLR schedule parity against torch.optim.lr_scheduler.StepLR, including
the reference's optimizer-recreation-at-unfreeze restart (model.py:284-287)."""

import pytest
import torch

from sshslie_tpu.utils.schedule import step_lr


def _torch_lrs(start_lr, gamma, period, epochs, unfreeze=0):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=start_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=period, gamma=gamma)
    lrs = []
    for epoch in range(epochs):
        if unfreeze and epoch == unfreeze:
            # reference recreates optimizer at current lr + fresh scheduler
            cur = opt.param_groups[0]["lr"]
            opt = torch.optim.Adam([p], lr=cur)
            sched = torch.optim.lr_scheduler.StepLR(opt, step_size=period, gamma=gamma)
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    return lrs


@pytest.mark.parametrize("gamma,period", [(0.1, 3), (0.5, 2), (0.9, 5)])
def test_step_lr_matches_torch(gamma, period):
    want = _torch_lrs(1e-3, gamma, period, 12)
    got = [step_lr(e, 1e-3, gamma, period) for e in range(12)]
    for a, b in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)


def test_step_lr_constant_when_factor_one():
    assert all(step_lr(e, 1e-3, 1.0, 5) == 1e-3 for e in range(10))


@pytest.mark.parametrize("unfreeze", [2, 3, 5])
def test_step_lr_unfreeze_restart(unfreeze):
    want = _torch_lrs(1e-3, 0.5, 2, 10, unfreeze=unfreeze)
    got = [step_lr(e, 1e-3, 0.5, 2, unfreeze_epoch=unfreeze) for e in range(10)]
    for e, (a, b) in enumerate(zip(got, want)):
        assert a == pytest.approx(b, rel=1e-9), (e, got, want)
