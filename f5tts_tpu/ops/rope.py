"""Rotary position embeddings and the absolute sin/cos text-position table.

Reproduces the reference's two positional systems:

- ``precompute_freqs_cis``/``get_pos_embed_indices`` (``model/modules.py:196-219``):
  an NTK-rescalable ``cat([cos, sin])`` table added to text embeddings.
- x-transformers-style rotary attention embedding (``model/modules.py:414-419``
  via ``x_transformers.apply_rotary_pos_emb``). Parity quirk, deliberately kept:
  the reference applies RoPE to the *flat* ``(b, n, heads*dim_head)`` q/k before
  splitting heads, with a table of width ``dim_head`` — so only the first
  ``dim_head`` channels (i.e. head 0) are rotated. Checkpoints are trained with
  this behavior, so ``apply_rotary`` defaults to it; ``all_heads=True`` gives
  the conventional per-head rotation for from-scratch training runs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def precompute_freqs_cis(dim: int, end: int, theta: float = 10000.0, theta_rescale_factor: float = 1.0) -> np.ndarray:
    """``(end, dim)`` table: ``cat([cos(t f), sin(t f)], -1)`` with NTK rescaling."""
    theta = theta * theta_rescale_factor ** (dim / (dim - 2))
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    t = np.arange(end, dtype=np.float64)
    angles = np.outer(t, freqs)
    return np.concatenate([np.cos(angles), np.sin(angles)], axis=-1).astype(np.float32)


def get_pos_embed_indices(start: jnp.ndarray, length: int, max_pos: int, scale: float = 1.0) -> jnp.ndarray:
    """Per-row position indices ``start[:, None] + floor(arange(length) * scale)``, clamped."""
    pos = start[:, None] + (jnp.arange(length, dtype=jnp.float32)[None, :] * scale).astype(jnp.int32)
    return jnp.minimum(pos, max_pos - 1)


def rotary_freqs(seq_len: int, dim_head: int, theta: float = 10000.0) -> np.ndarray:
    """x-transformers convention: ``(seq_len, dim_head)`` = ``cat([f, f], -1)``
    where ``f[t, j] = t / theta**(2j/dim_head)`` (half-split layout)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim_head, 2).astype(np.float64) / dim_head))
    f = np.outer(np.arange(seq_len, dtype=np.float64), inv_freq)
    return np.concatenate([f, f], axis=-1).astype(np.float32)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(t: jnp.ndarray, freqs: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Apply rotary embedding to the first ``freqs.shape[-1]`` channels of ``t``.

    ``t``: ``(b, n, d_flat)`` (or any ``(..., n, d)``), ``freqs``: ``(n, rot_dim)``.
    Channels past ``rot_dim`` pass through unrotated (partial-rotary semantics of
    ``x_transformers.apply_rotary_pos_emb``, which the reference inherits).
    """
    rot_dim = freqs.shape[-1]
    seq_len = t.shape[-2]
    freqs = freqs[-seq_len:]
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    cos = jnp.cos(freqs).astype(t.dtype)
    sin = jnp.sin(freqs).astype(t.dtype)
    t_rot = t_rot * cos * scale + _rotate_half(t_rot) * sin * scale
    return jnp.concatenate([t_rot, t_pass], axis=-1)


def apply_rotary_per_head(q_or_k: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Conventional rotation of every head: ``(b, h, n, dim_head)`` input."""
    cos = jnp.cos(freqs).astype(q_or_k.dtype)
    sin = jnp.sin(freqs).astype(q_or_k.dtype)
    return q_or_k * cos + _rotate_half(q_or_k) * sin
