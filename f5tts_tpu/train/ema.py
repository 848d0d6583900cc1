"""Exponential moving average of params (parity with ema-pytorch semantics used
by the reference trainer: beta 0.9999, update_after_step 100, update_every 10 —
``model/trainer.py:98-100``)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EMAConfig:
    beta: float = 0.9999
    update_after_step: int = 100
    update_every: int = 10
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0


def ema_init(params):
    return jax.tree.map(jnp.copy, params)


def ema_decay(step: jnp.ndarray, cfg: EMAConfig) -> jnp.ndarray:
    """Warmup-aware decay schedule (ema-pytorch's get_current_decay)."""
    epoch = jnp.clip(step - cfg.update_after_step - 1, 0)
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** -cfg.power
    return jnp.where(epoch <= 0, 0.0, jnp.clip(value, 0.0, cfg.beta))


def ema_update(ema_params, params, step: jnp.ndarray, cfg: EMAConfig = EMAConfig()):
    """Conditional update at ``update_every`` cadence, lax.cond'ed so it stays
    inside the jitted train step (the reference updates host-side on rank 0)."""
    decay = ema_decay(step, cfg)
    do = (step % cfg.update_every) == 0

    def upd(ema):
        return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params)

    return jax.lax.cond(do, upd, lambda e: e, ema_params)
