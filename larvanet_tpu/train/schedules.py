"""Learning-rate schedules.

Two schedule styles exist in the reference:
  * step decay: lr = base * decay^(step // decay_steps)
    (reference models/edsr.py:124-125);
  * ReduceLROnPlateau driven by validation PSNR, mode='max',
    threshold_mode='abs' (reference models/LarvaNet.py:90-92, stepped in
    validate_for_train, models/LarvaNet.py:161).

ReduceLROnPlateau is inherently host-side control state (it reacts to a
metric the host computes between jitted steps); here it is a plain,
checkpointable dataclass that reproduces torch's semantics exactly:
 - `best` updates whenever metric > best + threshold (abs mode, max);
 - otherwise a bad-epoch counter increments; when it exceeds `patience`
   the lr is multiplied by `factor` (floored at `min_lr`) and a cooldown
   of `cooldown` steps begins, during which bad epochs don't count.
The resulting lr is fed into the jitted train step as a scalar argument.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import Dict


def step_decay_lr(base_lr: float, decay: float, decay_steps: int, step: int) -> float:
    return base_lr * (decay ** (step // decay_steps))


@dataclass
class ReduceLROnPlateau:
    lr: float
    factor: float = 0.5
    patience: int = 3
    cooldown: int = 6
    threshold: float = 1e-3
    min_lr: float = 1e-8
    mode: str = "max"
    eps: float = 1e-8  # torch parity: skip updates smaller than eps
    # internal state
    best: float = field(default=None)  # type: ignore[assignment]
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def __post_init__(self):
        if self.best is None:
            self.best = float("-inf") if self.mode == "max" else float("inf")

    def _is_better(self, metric: float) -> bool:
        if self.mode == "max":
            return metric > self.best + self.threshold
        return metric < self.best - self.threshold

    def step(self, metric: float) -> float:
        """Record a new metric value; returns the (possibly reduced) lr."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            if self.cooldown_counter <= 0:
                self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            # torch parity: apply only when the change exceeds eps
            if self.lr - new_lr > self.eps:
                print("ReduceLROnPlateau: reducing lr to %.8e" % (new_lr,))
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    # -- checkpoint support --------------------------------------------------
    def state_dict(self) -> Dict:
        return asdict(self)

    def load_state_dict(self, state: Dict) -> None:
        for k, v in state.items():
            setattr(self, k, v)


@dataclass
class StepLR:
    """torch optim.lr_scheduler.StepLR parity, stepped per batch
    (reference models/TreeNet.py:92)."""

    base_lr: float
    step_size: int
    gamma: float = 0.5
    last_epoch: int = 0

    def step(self) -> float:
        self.last_epoch += 1
        return self.get_lr()

    def get_lr(self) -> float:
        return self.base_lr * (self.gamma ** (self.last_epoch // self.step_size))

    def state_dict(self) -> Dict:
        return asdict(self)

    def load_state_dict(self, state: Dict) -> None:
        for k, v in state.items():
            setattr(self, k, v)
