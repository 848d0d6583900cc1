"""Length/span mask helpers (parity with ``model/utils.py:42-66``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lens_to_mask(lens: jnp.ndarray, length: int) -> jnp.ndarray:
    """``(b,) -> (b, length)`` bool, True where position < lens.

    Unlike the reference (which sizes to ``lens.max()``), ``length`` is an
    explicit static argument — XLA requires static shapes.
    """
    return jnp.arange(length)[None, :] < lens[:, None]


def mask_from_start_end_indices(length: int, start: jnp.ndarray, end: jnp.ndarray) -> jnp.ndarray:
    seq = jnp.arange(length)
    return (seq[None, :] >= start[:, None]) & (seq[None, :] < end[:, None])


def mask_from_frac_lengths(key: jax.Array, seq_len: jnp.ndarray, frac_lengths: jnp.ndarray, length: int) -> jnp.ndarray:
    """Random contiguous span of ``frac * seq_len`` frames per row (training
    infill mask, ``model/utils.py:58-66``)."""
    lengths = (frac_lengths * seq_len).astype(jnp.int32)
    max_start = seq_len - lengths
    rand = jax.random.uniform(key, frac_lengths.shape)
    start = jnp.clip((max_start * rand).astype(jnp.int32), 0, None)
    end = start + lengths
    return mask_from_start_end_indices(length, start, end)
