"""KL-annealing beta schedules (constant / linear warmup / cyclical).

Reference parity: the lineage anneals the KL weight during training; the
driver's scaled config mandates a *cyclical* schedule (BASELINE.json:8,
SURVEY.md 2.7). Schedules are pure jnp functions of the step counter so they
trace into the jitted train step (no host round-trip per step).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import KLScheduleConfig, TrainConfig


def beta_at(cfg: KLScheduleConfig, step) -> jnp.ndarray:
    """beta(step) as a traced scalar. step: int or traced int array."""
    step = jnp.asarray(step, dtype=jnp.float32)
    if cfg.kind == "constant":
        return jnp.full_like(step, cfg.beta_max)
    if cfg.kind == "linear":
        frac = jnp.clip(step / jnp.maximum(cfg.warmup_steps, 1), 0.0, 1.0)
        return cfg.beta_max * frac
    # cyclical (Fu et al. 2019 style): within each cycle, ramp linearly for
    # `ratio` of the cycle then hold at beta_max.
    pos = jnp.mod(step, cfg.cycle_steps) / jnp.maximum(cfg.cycle_steps, 1)
    frac = jnp.clip(pos / jnp.maximum(cfg.ratio, 1e-8), 0.0, 1.0)
    return cfg.beta_max * frac


def ss_prob_at(cfg: TrainConfig, step) -> jnp.ndarray:
    """Scheduled-sampling probability: linear 0 -> cfg.scheduled_sampling over
    cfg.scheduled_sampling_warmup steps (traced; VERDICT r1 weak 6). Early
    training stays (almost) fully teacher-forced so the decoder first learns
    the conditional distributions, then gradually sees its own predictions."""
    step = jnp.asarray(step, dtype=jnp.float32)
    frac = jnp.clip(step / jnp.maximum(cfg.scheduled_sampling_warmup, 1), 0.0, 1.0)
    return cfg.scheduled_sampling * frac
