"""Conditional flow matching: training loss + sampling entry.

Re-design of the reference ``CFM`` wrapper (``model/cfm.py:32-285``): instead
of an nn.Module owning the transformer, this is a config dataclass plus pure
functions over (params, batch) — jit/pjit/grad compose directly.

Training semantics (``cfm.py:212-285``):
- ``t ~ U(0,1)`` per sample; ``phi = (1-t) x0 + t x1``; target flow ``x1 - x0``.
- random contiguous infill span of ``U(0.7, 1.0)`` fraction per row; loss is
  masked MSE over that span (``cfm.py:243-283``).
- CFG training drops: audio-cond drop p=0.3; with p=0.2 drop both text and
  audio (``cfm.py:267-273``). The reference draws one Python ``random()`` per
  batch; here the draws are traced scalars from the step key (same
  distribution, reproducible under jit).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from f5tts_tpu.models.dit import DiTConfig
from f5tts_tpu.ops.masks import lens_to_mask, mask_from_frac_lengths
from f5tts_tpu.ops.mel import MelConfig


@dataclass(frozen=True)
class CFMConfig:
    model: DiTConfig = field(default_factory=DiTConfig)
    mel: MelConfig = field(default_factory=MelConfig)
    audio_drop_prob: float = 0.3
    cond_drop_prob: float = 0.2
    frac_lengths_mask: tuple[float, float] = (0.7, 1.0)
    max_duration: int = 4096


def cfm_loss(
    params,
    cfg: CFMConfig,
    key: jax.Array,
    mel: jnp.ndarray,  # (b, n, mel_dim) target mel (x1), padded
    text: jnp.ndarray,  # (b, nt) int ids, pad -1
    lens: jnp.ndarray,  # (b,) valid frames per row
    compute_dtype=jnp.float32,
    forward_fn=None,
):
    """Returns (loss, aux dict). Pure; wrap in jax.value_and_grad.

    ``forward_fn`` defaults to the backbone matching ``cfg.model``'s type
    (DiT / UNetT / MMDiT all share the apply signature).
    """
    if forward_fn is None:
        from f5tts_tpu.models import backbone_fns

        forward_fn = backbone_fns(cfg.model)[1]
    b, n, _ = mel.shape
    k_frac, k_span, k_x0, k_t, k_drop1, k_drop2, k_dropout = jax.random.split(key, 7)

    mask = lens_to_mask(lens, n)
    lo, hi = cfg.frac_lengths_mask
    frac_lengths = jax.random.uniform(k_frac, (b,), minval=lo, maxval=hi)
    rand_span_mask = mask_from_frac_lengths(k_span, lens, frac_lengths, n) & mask

    x1 = mel.astype(compute_dtype)
    x0 = jax.random.normal(k_x0, x1.shape, compute_dtype)
    t = jax.random.uniform(k_t, (b,), dtype=compute_dtype)

    phi = (1 - t[:, None, None]) * x0 + t[:, None, None] * x1
    flow = x1 - x0
    cond = jnp.where(rand_span_mask[..., None], 0.0, x1)

    drop_audio = jax.random.uniform(k_drop1, ()) < cfg.audio_drop_prob
    drop_both = jax.random.uniform(k_drop2, ()) < cfg.cond_drop_prob
    drop_audio_cond = jnp.broadcast_to(drop_audio | drop_both, (b,))
    drop_text = jnp.broadcast_to(drop_both, (b,))

    pred = forward_fn(
        params, cfg.model, phi, cond, text, t, drop_audio_cond, drop_text, mask=None,
        compute_dtype=compute_dtype, dropout_rng=k_dropout,
    )

    se = jnp.square(pred.astype(jnp.float32) - flow.astype(jnp.float32))
    span = rand_span_mask[..., None].astype(jnp.float32)
    # normalizer: selected frames x mel channels, matching loss[rand_span_mask].mean()
    denom = jnp.maximum(jnp.sum(rand_span_mask.astype(jnp.float32)) * se.shape[-1], 1.0)
    loss = jnp.sum(se * span) / denom
    return loss, {"masked_frames": jnp.sum(rand_span_mask), "t_mean": jnp.mean(t)}
