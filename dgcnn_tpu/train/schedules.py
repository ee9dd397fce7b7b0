"""Learning-rate schedules matching the reference's torch schedulers.

* cosine — CosineAnnealingLR(epochs, eta_min=1e-3), stepped per epoch
  (reference main_cls.py:73, 103-104).
* step — StepLR(20, 0.7) with the engine's 1e-5 floor logic
  (reference main_cls.py:75, 105-110: stops decaying once lr <= 1e-5).
* one_cycle — OneCycleLR(max_lr, total_steps), stepped per batch
  (reference main_partseg_dist.py:207-212, 263-264), torch defaults:
  pct_start=0.3, cosine anneal, div_factor=25, final_div_factor=1e4.

All schedules are pure functions of the *global step*; per-epoch schedules
take steps_per_epoch so the engine can step them per batch under jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing(base_lr: float, epochs: int, steps_per_epoch: int,
                     eta_min: float = 1e-3):
    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, epochs)
        return eta_min + (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * epoch / epochs)
        ) / 2

    return schedule


def step_decay(base_lr: float, steps_per_epoch: int, step_size: int = 20,
               gamma: float = 0.7, floor: float = 1e-5):
    def schedule(step):
        epoch = step // steps_per_epoch
        lr = base_lr * gamma ** (epoch // step_size)
        return jnp.maximum(lr, floor)

    return schedule


def _one_cycle_phases(total_steps: int, pct_start: float):
    """torch's phase boundaries are FLOATS (``float(pct_start * total) - 1``,
    OneCycleLR._initial_step): at small total_steps no step lands exactly on
    the peak.  Matching the float math keeps per-step values torch-exact at
    every scale."""
    up_steps = max(float(pct_start * total_steps) - 1, 1e-6)
    down_steps = max((total_steps - 1) - up_steps, 1e-6)
    return up_steps, down_steps


def one_cycle(max_lr: float, total_steps: int, pct_start: float = 0.3,
              div_factor: float = 25.0, final_div_factor: float = 1e4):
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_steps, down_steps = _one_cycle_phases(total_steps, pct_start)

    def schedule(step):
        step = jnp.minimum(step, total_steps - 1)
        up = step <= up_steps
        t_up = jnp.clip(step / up_steps, 0.0, 1.0)
        t_dn = jnp.clip((step - up_steps) / down_steps, 0.0, 1.0)
        lr_up = initial_lr + (max_lr - initial_lr) * (1 - jnp.cos(jnp.pi * t_up)) / 2
        lr_dn = max_lr + (min_lr - max_lr) * (1 - jnp.cos(jnp.pi * t_dn)) / 2
        return jnp.where(up, lr_up, lr_dn)

    return schedule


def one_cycle_momentum(total_steps: int, base_momentum: float = 0.85,
                       max_momentum: float = 0.95, pct_start: float = 0.3):
    """OneCycleLR's momentum cycling (torch ``cycle_momentum=True``, the
    default the reference's dist trainer inherits): momentum anneals
    INVERSELY to the lr — max->base over the warmup, base->max over the
    decay — so the SGD momentum buffer (or Adam's beta1) damps while the
    lr peaks.  Same phase boundaries and cosine interpolation as
    :func:`one_cycle`."""
    up_steps, down_steps = _one_cycle_phases(total_steps, pct_start)

    def schedule(step):
        step = jnp.minimum(step, total_steps - 1)
        up = step <= up_steps
        t_up = jnp.clip(step / up_steps, 0.0, 1.0)
        t_dn = jnp.clip((step - up_steps) / down_steps, 0.0, 1.0)
        m_up = base_momentum + (max_momentum - base_momentum) * (
            1 + jnp.cos(jnp.pi * t_up)) / 2
        m_dn = max_momentum + (base_momentum - max_momentum) * (
            1 + jnp.cos(jnp.pi * t_dn)) / 2
        return jnp.where(up, m_up, m_dn)

    return schedule


def make_momentum_schedule(name: str, *, epochs: int, steps_per_epoch: int):
    """The momentum counterpart of :func:`make_schedule`: cycled for the
    per-batch "cycle" scheduler, None (= keep the optimizer's constant
    momentum) otherwise.  The user's ``--momentum`` flag deliberately does
    NOT feed the cycle: torch's OneCycleLR overwrites the constructed
    momentum with its own 0.95/0.85 defaults every step, and the reference
    inherits that."""
    if name == "cycle":
        return one_cycle_momentum(epochs * steps_per_epoch)
    return None


def make_schedule(name: str, base_lr: float, *, epochs: int,
                  steps_per_epoch: int, use_sgd: bool = True):
    """Build the schedule an engine flag set selects (lr x100 under SGD, the
    reference convention — main_cls.py:67, main_partseg_dist.py:201)."""
    lr = base_lr * 100 if use_sgd else base_lr
    if name == "cos":
        return cosine_annealing(lr, epochs, steps_per_epoch)
    if name == "step":
        return step_decay(lr, steps_per_epoch)
    if name == "cycle":
        return one_cycle(lr, epochs * steps_per_epoch)
    raise ValueError(f"unknown scheduler {name!r}")
