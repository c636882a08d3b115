"""Learning-rate schedules as pure step->lr functions (optax-style).

Closed-form equivalents of the reference's stateful torch schedulers
(reference: basicsr/models/lr_scheduler.py): MultiStepRestartLR (:6-46)
and CosineAnnealingRestartLR (:70-118), plus the linear warmup wrapper
applied by the train loop (base_model.py:140-162). All operate on the
*iteration* counter, matching the reference's per-iteration stepping.
"""

from __future__ import annotations

import math


def multi_step_restart_lr(base_lr: float, milestones, gamma: float = 0.1,
                          restarts=(0,), restart_weights=(1,)):
    """MultiStep decay with restarts (reference: lr_scheduler.py:6-46).

    At each restart iteration the lr resets to base_lr * weight; each
    milestone after the latest restart multiplies by gamma.
    """
    assert len(restarts) == len(restart_weights)
    milestones = sorted(milestones)
    restarts = list(restarts)

    def schedule(step: int) -> float:
        # find latest restart <= step
        weight = 1.0
        last_restart = 0
        for r, w in zip(restarts, restart_weights):
            if step >= r:
                weight = w
                last_restart = r
        lr = base_lr * weight
        for m in milestones:
            if last_restart < m <= step:
                lr *= gamma
        return lr

    return schedule


def cosine_annealing_restart_lr(base_lr: float, periods,
                                restart_weights=(1,), eta_min: float = 0.0):
    """Per-period cosine annealing with restart weights
    (reference: lr_scheduler.py:70-118)."""
    assert len(periods) == len(restart_weights)
    cumulative = [sum(periods[:i + 1]) for i in range(len(periods))]

    def schedule(step: int) -> float:
        idx = len(periods) - 1
        for i, c in enumerate(cumulative):
            if step <= c:
                idx = i
                break
        weight = restart_weights[idx]
        nearest_restart = 0 if idx == 0 else cumulative[idx - 1]
        period = periods[idx]
        return eta_min + weight * 0.5 * (base_lr - eta_min) * (
            1 + math.cos(math.pi * ((step - nearest_restart) / period)))

    return schedule


def constant_lr(base_lr: float):
    return lambda step: base_lr


def with_warmup(schedule, base_lr: float, warmup_iter: int = -1):
    """Linear warmup from 0 over warmup_iter iterations, then the base
    schedule (reference: base_model.py:140-162: warmup uses init_lr *
    current_iter / warmup_iter)."""
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def warmed(step: int) -> float:
        if step < warmup_iter:
            return base_lr * step / float(warmup_iter)
        return schedule(step)

    return warmed


def build_schedule(train_opt: dict, base_lr: float):
    """Build a step->lr function from the YAML ``scheduler`` block."""
    sched_opt = dict(train_opt.get('scheduler', {}) or {})
    sched_type = sched_opt.pop('type', None)
    if sched_type in ('MultiStepLR', 'MultiStepRestartLR'):
        schedule = multi_step_restart_lr(base_lr, **sched_opt)
    elif sched_type == 'CosineAnnealingRestartLR':
        schedule = cosine_annealing_restart_lr(base_lr, **sched_opt)
    elif sched_type in (None, 'ConstantLR'):
        schedule = constant_lr(base_lr)
    else:
        raise NotImplementedError(
            f'Scheduler {sched_type} is not implemented yet.')
    return with_warmup(schedule, base_lr, train_opt.get('warmup_iter', -1))
