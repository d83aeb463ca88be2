"""LR schedules matching /root/reference/trainers/lr_scheduler.py semantics.

The reference steps the scheduler once per optimizer step (baseTrainer.py:207).
CosineAnnealingLR_Restart (lr_scheduler.py:51-91) is a stateful chained
recursion; its closed form (proved by induction over the ratio recursion at
lr_scheduler.py:88-91, incl. the periodic-continuation branch at :80-85) is:

    step 0            -> lr_init
    step s >= 1, with i = number of (restart+1) values <= s:
        base  = lr_init * restart_weights[i-1]   (lr_init if i == 0)
        start = restarts[i-1] + 1                (0 if i == 0)
        T     = T_period[i]
        t     = s - start
        amp   = base if t <= T else lr_init      (see below)
        lr    = eta_min + (amp - eta_min) * (1 + cos(pi*t/T)) / 2

The cosine is intentionally NOT clamped at t = T: past the segment end the
reference's branch-2/branch-3 recursion continues the cosine periodically.
Quirk kept bit-for-bit: the periodic-continuation branch (lr_scheduler.py:
80-85) rebuilds the amplitude from the UNWEIGHTED `base_lr` (= lr_init, the
param group's initial_lr), not the restart-weighted segment base — so a
weighted segment that runs past its T bounces back at full lr_init amplitude
(verified step-for-step against the stateful recursion in
tests/test_train_e2e.py::test_cosine_schedule_general_restarts_vs_oracle).
LR_decay: lr_init * rate^(number of decay periods passed)."""

from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing_restart(lr_init: float, eta_min: float, period,
                             restarts=(), restart_weights=()):
    """General multi-restart cosine (lr_scheduler.py:51-91).

    `restarts` are the raw config values (the internal +1 offset of
    lr_scheduler.py:57 is applied here). `period` is either the full
    T_period list (len == len(restarts) + 1, reference semantics where
    T_max switches to T_period[index+1] at each restart, :77) or a scalar
    applied to every segment (the shipped configs' case)."""
    rs = [float(r) + 1.0 for r in restarts]
    ws = [float(w) for w in restart_weights] or [1.0] * len(rs)
    if len(rs) != len(ws):
        raise ValueError("restarts and their weights do not match "
                         f"({len(rs)} vs {len(ws)}) — lr_scheduler.py:60-61")
    if isinstance(period, (list, tuple)):
        periods = [float(p) for p in period]
        if len(periods) != len(rs) + 1:
            raise ValueError(
                f"T_period needs len(restarts)+1 = {len(rs) + 1} entries, "
                f"got {len(periods)}")
    else:
        periods = [float(period)] * (len(rs) + 1)
    if any(rs[i] >= rs[i + 1] for i in range(len(rs) - 1)):
        raise ValueError(f"restarts must be strictly increasing: {restarts}")

    starts = jnp.asarray([0.0] + rs, jnp.float32)
    bases = jnp.asarray([lr_init] + [lr_init * w for w in ws], jnp.float32)
    t_arr = jnp.asarray(periods, jnp.float32)
    rs_arr = jnp.asarray(rs, jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        i = jnp.sum(step >= rs_arr).astype(jnp.int32)
        t = step - starts[i]
        # past the segment end the reference's continuation branch rebuilds
        # from the unweighted initial_lr (lr_scheduler.py:83) — quirk kept
        amp = jnp.where(t <= t_arr[i], bases[i], jnp.float32(lr_init))
        cos_lr = eta_min + (amp - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / t_arr[i]))
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
