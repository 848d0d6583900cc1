"""Fused AR decode-step attention (Pallas/Mosaic): q-length-1 cache attention.

VERDICT r4 item #3 / PARLER_STEP_PROBE.json: the XLA decode step spends
~190 us/layer on cache self-attention against a ~40 us/layer streaming bound
— XLA lays out the (b, h, total, d) cache for two separate contractions
(logits and PV) and materializes f32 logits in HBM between them, roughly
tripling the cache traffic. This kernel reads the K and V caches exactly once
per step and keeps logits/softmax in VMEM registers.

Shape regime (reference deployment `dhwani_config.json:81`, indic-parler-tts
decode: b=16..32, h=16, total≈500, d=64):

- q is ONE position per row: ``(b, h, 1, d)``. The caller maintains the K
  cache TRANSPOSED ``(b, n_kv, d, total)`` (new keys written as (d, 1)
  columns at the lane position), so logits come out ``(8, total)`` with
  cache positions on the LANE axis — softmax reduces over lanes exactly
  like the serving flash kernel; the PV dot contracts the position axis
  inside the MXU against the normal-layout ``(total, d)`` V cache (see the
  kernel docstring for the two measured dead-end formulations).
- grid is ``(b,)``; each cell streams one batch row's whole head block
  (~2 MB bf16 at the real geometry) through VMEM with a python loop over
  KV heads; Mosaic double-buffers rows across grid steps.
- masking is an additive f32 bias row per (batch, position) ``(b, total)``
  — the caller folds the causal step bound and key-padding into it (it
  changes per decode step but not per layer, so it is built once per step
  in XLA: ~32 KB, negligible).
- GQA (``kv_heads < heads``): q arrives grouped ``(b, n_kv, group, d)``
  and the kernel loops group members per kv head.

``total`` must be a multiple of 128 (lane tile) — the decode context
rounds the cache allocation up and the causal bound masks the tail
(models/parler.py:_decode_ctx); cross-attention K/V/bias are padded the
same way once per decode call.

Falls back to interpreter mode off-TPU so CPU tests run the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, group: int):
    """Lane-major MXU formulation of the length-1-q contractions. Two dead
    ends informed this shape (BENCH.md round 5): Mosaic rejects N=1 dots
    ('only constant accumulators supported'), and both a VPU
    broadcast-multiply/reduce version and a sublane-major MXU version (q
    lane-broadcast to N=128, softmax reducing over SUBLANES) measured at
    ~7% of the streaming bound — sublane reductions are the slow axis.
    So: the K cache is stored TRANSPOSED (d, total), logits come out
    (8, total) with positions on LANES (q sublane-broadcast to the 8-row
    f32 tile; the 8x redundant rows are idle-MXU work), the softmax reduces
    over lanes exactly like the serving flash kernel, and the PV dot
    contracts the position axis inside the MXU against the NORMAL-layout
    (total, d) V cache."""
    bias = bias_ref[0]                           # (1, total) f32
    vdt = v_ref.dtype
    for hh in range(v_ref.shape[1]):
        kt = k_ref[0, hh]                        # (d, total)
        v = v_ref[0, hh]                         # (total, d)
        qh = q_ref[0, hh]                        # (group, d), pre-scaled
        outs = []
        for g in range(group):
            q_rep = jnp.broadcast_to(qh[g:g + 1], (8, qh.shape[1]))
            s = jax.lax.dot_general(
                q_rep, kt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (8, total), equal rows
            s = s + bias
            mx = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=1, keepdims=True)
            p = p / jnp.maximum(l, 1e-30)        # normalize in f32 (matches
            pb = p.astype(vdt)                   # jax.nn.softmax -> astype)
            o = jax.lax.dot_general(
                pb, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (8, d), equal rows
            outs.append(o[0:1])
        o = outs[0] if group == 1 else jnp.concatenate(outs, axis=0)
        o_ref[0, hh] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jnp.ndarray,        # (b, h, 1, d) — pre-scaled by head_dim**-0.5
    k_cache_t: jnp.ndarray,# (b, n_kv, d, total) — TRANSPOSED key cache
    v_cache: jnp.ndarray,  # (b, n_kv, total, d)
    bias: jnp.ndarray,     # (b, total) f32 additive (0 allowed / -1e9 banned)
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """One decode position of masked softmax attention against a KV cache.

    The caller maintains the K cache transposed — new keys are written as
    ``(…, d, 1)`` columns at the lane position — so logits land with cache
    positions on the lane axis (fast softmax). Returns ``(b, h, 1, d)`` in
    q.dtype. ``h`` must be a multiple of the cache's ``n_kv`` (GQA groups);
    ``total`` a multiple of 128 (lane tile).
    """
    b, h, one, d = q.shape
    _, n_kv, _, total = k_cache_t.shape
    assert one == 1 and h % n_kv == 0, (q.shape, k_cache_t.shape)
    assert v_cache.shape == (b, n_kv, total, d), (v_cache.shape, k_cache_t.shape)
    assert total % 128 == 0, f"pad the cache: total={total} not a multiple of 128"
    group = h // n_kv
    qg = q.reshape(b, n_kv, group, d)
    bias_row = bias.astype(jnp.float32).reshape(b, 1, total)

    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, group=group),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, total), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, group, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, d, total), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, total, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_kv, group, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_kv, group, d), q.dtype),
        interpret=interpret,
    )(bias_row, qg, k_cache_t, v_cache)
    return out.reshape(b, h, 1, d)


def decode_attention_auto(q, k_cache_t, v_cache, bias):
    """TPU -> compiled kernel; anything else -> interpreter (CPU tests)."""
    interpret = jax.default_backend() != "tpu"
    return decode_attention(q, k_cache_t, v_cache, bias, interpret=interpret)
