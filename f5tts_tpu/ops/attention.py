"""Multi-head attention compute paths (non-causal, key-padding masked).

Semantics mirror the reference's ``AttnProcessor`` (``model/modules.py:395-449``):
bidirectional SDPA where the padding mask masks *keys only* — padded query rows
produce garbage that callers zero out afterwards — with fp32 softmax.

Two implementations behind one dispatcher:

- ``xla``: plain einsum attention; XLA fuses and tiles it onto the MXU. Good to
  ~2k frames on one chip.
- ``flash``: Pallas TPU flash-attention kernel (``f5tts_tpu.ops.pallas``),
  VMEM-tiled online-softmax, the #1 kernel target identified in SURVEY.md §2.2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-finite instead of -inf: keeps fully-masked rows NaN-free


def sdpa_xla(
    q: jnp.ndarray,  # (b, h, n, d)
    k: jnp.ndarray,  # (b, h, n, d)
    v: jnp.ndarray,  # (b, h, n, d)
    key_mask: jnp.ndarray | None = None,  # (b, n) bool, True = valid key
) -> jnp.ndarray:
    dim_head = q.shape[-1]
    scale = dim_head**-0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.jit, static_argnames=("impl",))
def multihead_attention(q, k, v, key_mask=None, impl: str = "xla"):
    """Dispatch on implementation. Inputs/outputs are ``(b, h, n, d)``."""
    if impl == "xla":
        return sdpa_xla(q, k, v, key_mask)
    if impl == "flash":
        from f5tts_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, key_mask)
    raise ValueError(f"unknown attention impl {impl!r}")
