"""Learning-rate schedule reproducing the reference's StepLR behavior.

The reference steps ``StepLR(step_size=lr_update_period, gamma=lr_update_factor)``
once per epoch (reference model.py:216-217,334-335), and — when the
decomposition net unfreezes — recreates both the Adam optimizer *and* the
scheduler with the then-current LR as the new base (model.py:284-287), which
restarts the decay clock. :func:`step_lr` captures both behaviors as a pure
function of the epoch so it can live inside a jitted train step.
"""

from __future__ import annotations


def step_lr(
    epoch: int,
    start_lr: float,
    gamma: float,
    period: int,
    unfreeze_epoch: int = 0,
) -> float:
    """LR for ``epoch`` (0-based) under the reference's StepLR quirks.

    With ``unfreeze_epoch > 0`` the scheduler is considered recreated at that
    epoch: its base becomes the LR in effect then and the period counter
    restarts (reference model.py:284-287).
    """
    if abs(gamma - 1.0) <= 1e-6:
        return start_lr
    if unfreeze_epoch and epoch >= unfreeze_epoch:
        base = start_lr * gamma ** (unfreeze_epoch // period)
        return base * gamma ** ((epoch - unfreeze_epoch) // period)
    return start_lr * gamma ** (epoch // period)
