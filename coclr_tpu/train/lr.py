"""LR schedules.

- `step_schedule`: the reference's stateless cumulative decay
  (main_nce.py:356-363): lr * 0.1 per milestone passed.
- `cosine_schedule`: the reference parses --cos but never implements it
  (main_coclr.py:92-93,228); implemented for real here.
"""

from __future__ import annotations

import math
from typing import Sequence


def step_schedule(base_lr: float, epoch: int, milestones: Sequence[int]) -> float:
    lr = base_lr
    for m in milestones:
        lr *= 0.1 if epoch >= m else 1.0
    return lr


def cosine_schedule(base_lr: float, epoch: int, total_epochs: int) -> float:
    return base_lr * 0.5 * (1.0 + math.cos(math.pi * epoch / max(1, total_epochs)))


def get_lr(cfg, epoch: int) -> float:
    if getattr(cfg, "cos", False):
        return cosine_schedule(cfg.lr, epoch, cfg.epochs)
    return step_schedule(cfg.lr, epoch, cfg.schedule)
