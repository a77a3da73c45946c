"""Learning-rate schedules for the trainers.

The upstream recipes behind the released weights both anneal: arcface_torch
trains w600k with linear warmup + polynomial decay (power 2), and the SCRFD
paper's mmdetection config uses linear warmup + step decay (cosine is the
modern equivalent). One helper builds either shape as an optax schedule;
optax.sgd accepts it in place of a constant learning rate.
"""
from __future__ import annotations

from typing import Optional, Union

import optax


def make_lr_schedule(peak_lr: float, warmup_steps: int = 0,
                     decay_steps: Optional[int] = None, decay: str = "poly",
                     end_lr: float = 0.0, power: float = 2.0
                     ) -> Union[float, optax.Schedule]:
    """Constant float when nothing is requested; else warmup->decay schedule.

    warmup_steps: linear 0 -> peak_lr over this many steps.
    decay_steps: anneal peak_lr -> end_lr over this many steps AFTER warmup
    ("poly" with `power`, or "cosine"). None holds peak_lr after warmup.
    """
    if not warmup_steps and decay_steps is None:
        return peak_lr
    scheds, bounds = [], []
    if warmup_steps:
        scheds.append(optax.linear_schedule(0.0, peak_lr, warmup_steps))
        bounds.append(warmup_steps)
    if decay_steps is not None:
        if decay == "cosine":
            alpha = (end_lr / peak_lr) if peak_lr else 0.0
            scheds.append(optax.cosine_decay_schedule(peak_lr, decay_steps,
                                                      alpha=alpha))
        elif decay == "poly":
            scheds.append(optax.polynomial_schedule(peak_lr, end_lr, power,
                                                    decay_steps))
        else:
            raise ValueError(f"decay must be 'poly' or 'cosine', got {decay!r}")
    else:
        scheds.append(optax.constant_schedule(peak_lr))
    return (optax.join_schedules(scheds, bounds) if len(scheds) > 1
            else scheds[0])
