"""LR schedules matching /root/reference/trainers/lr_scheduler.py semantics.

The reference steps the scheduler once per optimizer step (baseTrainer.py:207).
CosineAnnealingLR_Restart with the shipped params (T_period=[0, T], restarts=[0]
-> internally [1], weights=[1]) reduces to: step 0 -> lr_init; step >= 1 ->
eta_min + (lr_init - eta_min) * (1 + cos(pi * (step - 1) / T)) / 2.
LR_decay: lr_init * rate^(number of decay periods passed)."""

from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing_restart(lr_init: float, eta_min: float, period: int,
                             restarts=(), restart_weights=()):
    """General multi-restart cosine (lr_scheduler.py:51-91). `restarts` are the
    raw config values (cumsum of T_period[:-1]); internal +1 offset applied."""
    restarts = [r + 1 for r in restarts]
    weights = list(restart_weights) or [1.0] * len(restarts)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # shipped configs have a single segment after restart at 1
        last_restart = jnp.float32(restarts[0] if restarts else 0.0)
        w = jnp.float32(weights[0] if weights else 1.0)
        base = lr_init * w
        t = jnp.clip(step - last_restart, 0.0, float(period))
        cos_lr = eta_min + (base - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / float(period)))
        return jnp.where(step < 1.0, jnp.float32(lr_init), cos_lr)

    return schedule


def lr_decay(lr_init: float, decay_period, decay_rate: float):
    """Step decay (lr_scheduler.py:93-120)."""
    periods = jnp.asarray(list(decay_period), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        idx = jnp.sum(step > periods)
        return lr_init * decay_rate ** idx

    return schedule


def from_config(config):
    if config.LRS == "CA":
        return cosine_annealing_restart(config.lr_init, config.lr_min,
                                        config.total_itr, restarts=[0],
                                        restart_weights=[1.0])
    if config.LRS == "LD":
        return lr_decay(config.lr_init, config.decay_period, config.decay_rate)
    # constant fallback
    return lambda step: jnp.float32(config.lr_init)
