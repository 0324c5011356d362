"""Learning-rate schedules (parity with backend/inpaint/video/core/
lr_scheduler.py:9-100): multi-step with restarts and cosine-annealing with
restarts, as optax-compatible schedule functions."""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def multi_step_restart_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    restarts: Sequence[int] = (0,),
    restart_weights: Sequence[float] = (1.0,),
):
    """Step decay at milestones; LR resets (scaled by restart_weights) at
    each restart iteration."""
    assert len(restarts) == len(restart_weights)
    milestones = list(milestones)
    restarts = list(restarts)

    def schedule(step):
        step = jnp.asarray(step)
        weight = jnp.ones_like(step, jnp.float32)
        since_restart = step
        for r, w in zip(restarts, restart_weights):
            hit = step >= r
            weight = jnp.where(hit, w, weight)
            since_restart = jnp.where(hit, step - r, since_restart)
        power = jnp.zeros_like(step, jnp.float32)
        for m in milestones:
            power = power + (since_restart >= m).astype(jnp.float32)
        return base_lr * weight * (gamma ** power)

    return schedule


def cosine_annealing_restart_lr(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1.0,),
    eta_min: float = 1e-7,
):
    """Cosine annealing within each period, restarting with scaled weight."""
    assert len(periods) == len(restart_weights)
    cumulative = [0]
    for p in periods:
        cumulative.append(cumulative[-1] + p)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.full_like(step, eta_min)
        for i, period in enumerate(periods):
            start, end = cumulative[i], cumulative[i + 1]
            inside = (step >= start) & (step < end)
            t = jnp.clip((step - start) / max(period, 1), 0.0, 1.0)
            value = eta_min + restart_weights[i] * 0.5 * (base_lr - eta_min) \
                * (1 + jnp.cos(jnp.pi * t))
            lr = jnp.where(inside, value, lr)
        # past the last period: stay at the final value of the last cosine
        lr = jnp.where(step >= cumulative[-1], eta_min, lr)
        return lr

    return schedule
