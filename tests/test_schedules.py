"""LR schedule parity: our host-side ReduceLROnPlateau/StepLR vs the
actual torch schedulers the reference uses (LarvaNet.py:90-92,
TreeNet.py:92), on randomized metric sequences."""

import numpy as np
import pytest
import torch

from larvanet_tpu.train.schedules import ReduceLROnPlateau, StepLR


@pytest.mark.parametrize("patience,cooldown,threshold", [(3, 6, 1e-3), (1, 0, 1e-3), (2, 3, 0.1)])
def test_plateau_matches_torch(rng, patience, cooldown, threshold):
    lr0, factor, min_lr = 4e-4, 0.5, 1e-8
    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([param], lr=lr0)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=factor, patience=patience, cooldown=cooldown,
        threshold=threshold, threshold_mode="abs", min_lr=min_lr)
    ours = ReduceLROnPlateau(lr=lr0, factor=factor, patience=patience,
                             cooldown=cooldown, threshold=threshold,
                             min_lr=min_lr, mode="max")
    # a noisy-then-plateauing PSNR-like sequence
    metrics = list(28 + np.cumsum(rng.normal(0.05, 0.2, 60)))
    metrics += [metrics[-1]] * 40  # hard plateau
    for i, m in enumerate(metrics):
        tsched.step(m)
        ours.step(m)
        torch_lr = opt.param_groups[0]["lr"]
        assert ours.lr == pytest.approx(torch_lr, rel=1e-9), (
            "diverged at step %d: ours=%g torch=%g" % (i, ours.lr, torch_lr))


def test_steplr_matches_torch():
    lr0, step_size, gamma = 4e-4, 7, 0.5
    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([param], lr=lr0)
    tsched = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size, gamma=gamma)
    ours = StepLR(base_lr=lr0, step_size=step_size, gamma=gamma)
    for i in range(40):
        # torch: optimizer.step() then scheduler.step()
        tsched.step()
        ours.step()
        assert ours.get_lr() == pytest.approx(opt.param_groups[0]["lr"], rel=1e-9), i


def test_plateau_checkpoint_roundtrip():
    s = ReduceLROnPlateau(lr=1e-3, patience=2)
    for m in [30.0, 30.0, 29.9, 29.8, 29.8]:
        s.step(m)
    state = s.state_dict()
    s2 = ReduceLROnPlateau(lr=1e-3, patience=2)
    s2.load_state_dict(state)
    for m in [29.7, 29.6, 29.5, 29.4]:
        a = s.step(m)
        b = s2.step(m)
        assert a == b
