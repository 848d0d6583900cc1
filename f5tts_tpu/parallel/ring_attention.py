"""Context-parallel ring attention over the mel-frame axis.

The reference caps a single generation at 4096 frames and handles longer form
above the model via chunk+crossfade (SURVEY §5 "Long-context": no distributed
sequence support at all). This is the TPU-native scaling experiment for
>4096-frame sequences: shard q/k/v along the sequence axis over a mesh axis,
rotate k/v blocks around the ring with ``lax.ppermute`` (XLA lowers to ICI
sends), and maintain a numerically-stable online softmax per hop.

The model's attention is bidirectional and non-causal (``modules.py:436``), so
every rank processes every block — no causal early-exit; the win is memory
(O(n/p) activations per chip) and compute distribution, not skipped work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _ring_body(q, k, v, bias, axis_name: str):
    """Per-shard computation: q (b,h,ns,d) local; k/v/bias rotate."""
    p = lax.psum(1, axis_name)
    scale = q.shape[-1] ** -0.5

    m = jnp.full(q.shape[:-1] + (1,), NEG_INF, jnp.float32)
    l = jnp.zeros_like(m)
    acc = jnp.zeros(q.shape, jnp.float32)
    perm = [(i, (i + 1) % p) for i in range(p)]

    def hop(i, carry):
        k_cur, v_cur, bias_cur, m, l, acc = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur, preferred_element_type=jnp.float32) * scale
        s = s + bias_cur[:, None, None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        prob = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(prob, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", prob.astype(v_cur.dtype), v_cur).astype(jnp.float32)
        k_cur = lax.ppermute(k_cur, axis_name, perm)
        v_cur = lax.ppermute(v_cur, axis_name, perm)
        bias_cur = lax.ppermute(bias_cur, axis_name, perm)
        return k_cur, v_cur, bias_cur, m_new, l, acc

    _, _, _, m, l, acc = lax.fori_loop(0, p, hop, (k, v, bias, m, l, acc))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # (b, h, n, d) — n shardable by the cp axis
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray | None,  # (b, n) bool
    mesh: Mesh | None = None,  # None -> ambient mesh (jax.sharding.set_mesh)
    axis_name: str = "cp",
) -> jnp.ndarray:
    b, h, n, d = q.shape
    if key_mask is None:
        key_mask = jnp.ones((b, n), bool)
    bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)

    seq_spec = P(None, None, axis_name, None)
    kwargs = {} if mesh is None else {"mesh": mesh}
    out = jax.shard_map(
        functools.partial(_ring_body, axis_name=axis_name),
        in_specs=(seq_spec, seq_spec, seq_spec, P(None, axis_name)),
        out_specs=seq_spec,
        check_vma=False,
        **kwargs,
    )(q, k, v, bias)
    return out


def cp_sharded(mesh: Mesh, axis_name: str = "cp"):
    """NamedSharding placing the sequence axis of (b,h,n,d) on the cp axis."""
    return NamedSharding(mesh, P(None, None, axis_name, None))
