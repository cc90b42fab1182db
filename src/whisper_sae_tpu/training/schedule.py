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

import jax.numpy as jnp


def warmup_cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Reference-parity warmup->cosine schedule.

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
        t = jnp.asarray(count, jnp.float32)
        if w > 0:
            warm = base_lr * (0.01 + 0.99 * jnp.minimum(t, w) / w)
        else:
            warm = jnp.asarray(base_lr, jnp.float32)
        c = jnp.clip(t - w, 0.0, t_cos)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * c / t_cos))
        return jnp.where(t < w, warm, cos)

    return schedule


def constant_schedule(base_lr: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """LR before ``setup_scheduler`` is called (reference: scheduler=None
    means the optimizer runs at its base LR)."""

    def schedule(count):
        del count
        return jnp.asarray(base_lr, jnp.float32)

    return schedule
