"""Learning-rate schedule matching the reference trainer exactly.

The reference composes torch ``SequentialLR(LinearLR(start_factor=0.01 ->
1.0 over W), CosineAnnealingLR(T_max=total-W, eta_min=0.1*lr))`` with
``W = min(config.warmup_steps, total_steps // 10)``
(/root/reference/src/whisper_sae/sae/training.py:136-159).  This module
reproduces that curve analytically as an optax-style ``schedule(count)``.

Semantics pinned down from torch:
- step count ``t`` is the number of optimizer updates already applied
  (torch calls scheduler.step() *after* each optimizer step, so update
  ``t`` uses the LR computed from ``t`` prior scheduler steps);
- warmup at t < W:   lr = base * (0.01 + 0.99 * t / W)
- cosine at t >= W:  c = t - W;  lr = 0.1*base + 0.9*base*(1+cos(pi*c/(total-W)))/2
  (at the boundary t == W this is exactly ``base``, matching torch's
  SequentialLR handoff).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def warmup_cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
) -> Callable:
    """Reference-parity warmup->cosine schedule.

    Works on both traced jax values (inside the optimizer) and plain
    numpy/int inputs (host-side metric logging — evaluating the schedule
    on host must not dispatch a device computation per step).

    Args:
        base_lr: peak learning rate.
        total_steps: total optimizer updates in the run.
        warmup_steps: the *configured* warmup; the effective warmup is
            ``min(warmup_steps, total_steps // 10)`` (reference
            training.py:142).
    """
    w = min(warmup_steps, total_steps // 10)
    t_cos = max(total_steps - w, 1)
    eta_min = 0.1 * base_lr

    def schedule(count):
        xp = jnp if isinstance(count, jax.core.Tracer) or isinstance(
            count, jax.Array
        ) else np
        t = xp.asarray(count, xp.float32)
        if w > 0:
            warm = base_lr * (0.01 + 0.99 * xp.minimum(t, w) / w)
        else:
            warm = base_lr * xp.ones_like(t)
        c = xp.clip(t - w, 0.0, t_cos)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (1.0 + xp.cos(xp.pi * c / t_cos))
        return xp.where(t < w, warm, cos)

    return schedule


def constant_schedule(base_lr: float) -> Callable:
    """LR before ``setup_scheduler`` is called (reference: scheduler=None
    means the optimizer runs at its base LR)."""

    def schedule(count):
        if isinstance(count, jax.core.Tracer) or isinstance(count, jax.Array):
            return jnp.full(jnp.shape(count), base_lr, jnp.float32)
        return np.full(np.shape(count), base_lr, np.float32)[()]

    return schedule
