"""Fused AR decode-step attention (Pallas/Mosaic): q-length-1 cache attention.

VERDICT r4 item #3 / PARLER_STEP_PROBE.json: the XLA decode step spends
~190 us/layer on cache self-attention against a ~40 us/layer streaming bound
— XLA lays out the (b, h, total, d) cache for two separate contractions
(logits and PV) and materializes f32 logits in HBM between them, roughly
tripling the cache traffic. This kernel reads the K and V caches exactly once
per step and keeps logits/softmax in VMEM registers.

Shape regime (reference deployment `dhwani_config.json:81`, indic-parler-tts
decode: b=16..32, h=16, total≈500, d=64):

- q is ONE position per row: ``(b, h, 1, d)``. The MXU M dim is hopeless
  either way — the kernel is bandwidth-bound, so logits are computed with the
  CACHE on the M/sublane axis: ``s = K(total,d) @ q(d,group)`` -> (total,
  group), softmax reduces over sublanes, and the PV contraction
  ``P^T(group,total) @ V(total,d)`` contracts the same axis — no transposes,
  no relayouts, one pass over K and one over V.
- grid is ``(b,)``; each cell streams one batch row's whole head block
  ``(n_kv, total, d)`` (~2 MB bf16 at the real geometry) through VMEM with a
  python loop over KV heads; Mosaic double-buffers rows across grid steps.
- masking is an additive f32 bias per (batch, position) ``(b, total, 1)``
  column — the caller folds the causal step bound and key-padding into it
  (it changes per decode step but not per layer, so it is built once per
  step in XLA: ~32 KB, negligible).
- GQA (``kv_heads < heads``): q arrives grouped ``(b, n_kv, group, d)``; the
  group rides the logits' lane axis, so llama-style repeat_kv costs nothing.

``total`` must be a multiple of 16 (bf16 sublane tile) — the decode context
rounds the cache allocation up and the causal bound masks the tail
(models/parler.py:_decode_ctx).

Falls back to interpreter mode off-TPU so CPU tests run the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, group: int):
    """No dot_general: q has one position, so both contractions are
    broadcast-multiply + reductions (lane reduction for logits, sublane
    reduction for PV) — this jaxlib's Mosaic rejects N=1/mixed-dtype MXU
    dots ('only constant accumulators supported'), and the kernel is
    bandwidth-bound anyway; f32 VPU math matches the XLA path's f32
    accumulate."""
    bias = bias_ref[0][None]                     # (1, total, 1) f32
    k32 = k_ref[0].astype(jnp.float32)           # (n_kv, total, d)
    v32 = v_ref[0].astype(jnp.float32)
    vdt = v_ref.dtype
    outs = []
    for g in range(group):
        qg = q_ref[0][:, g:g + 1, :].astype(jnp.float32)   # (n_kv, 1, d)
        s = jnp.sum(k32 * qg, axis=2, keepdims=True) + bias  # (n_kv, total, 1)
        mx = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = p / jnp.maximum(l, 1e-30)            # normalize in f32 (matches
        pb = p.astype(vdt).astype(jnp.float32)   # jax.nn.softmax -> astype)
        outs.append(jnp.sum(pb * v32, axis=1, keepdims=True))  # (n_kv, 1, d)
    o = outs[0] if group == 1 else jnp.concatenate(outs, axis=1)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jnp.ndarray,       # (b, h, 1, d) — pre-scaled by head_dim**-0.5
    k_cache: jnp.ndarray, # (b, n_kv, total, d)
    v_cache: jnp.ndarray, # (b, n_kv, total, d)
    bias: jnp.ndarray,    # (b, total) f32 additive (0 allowed / -1e9 banned)
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """One decode position of masked softmax attention against a KV cache.

    Returns ``(b, h, 1, d)`` in q.dtype. ``h`` must be a multiple of the
    cache's ``n_kv`` (GQA groups); ``total`` a multiple of 16.
    """
    b, h, one, d = q.shape
    _, n_kv, total, _ = k_cache.shape
    assert one == 1 and h % n_kv == 0, (q.shape, k_cache.shape)
    assert total % 16 == 0, f"pad the cache: total={total} not a multiple of 16"
    group = h // n_kv
    qg = q.reshape(b, n_kv, group, d)
    bias_col = bias.astype(jnp.float32).reshape(b, total, 1)

    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, group=group),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, total, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, group, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, total, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, total, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_kv, group, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_kv, group, d), q.dtype),
        interpret=interpret,
    )(bias_col, qg, k_cache, v_cache)
    return out.reshape(b, h, 1, d)


def decode_attention_auto(q, k_cache, v_cache, bias):
    """TPU -> compiled kernel; anything else -> interpreter (CPU tests)."""
    interpret = jax.default_backend() != "tpu"
    return decode_attention(q, k_cache, v_cache, bias, interpret=interpret)
