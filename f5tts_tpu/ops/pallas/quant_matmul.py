"""Fused W8A8 matmul kernel: per-token activation quantization in VMEM +
int8 MXU dot + rescale, in one pass.

The XLA-level W8A8 path (``modules._linear_int8``) measured *slower* than bf16
(quantize/rescale round-trips through HBM); this kernel keeps the int8
activations and the int32 accumulator on-chip. v5e int8 MXU throughput is 2x
bf16.

Layout: x ``(tokens, K)`` bf16/f32, w_q ``(K, N)`` int8, s_w ``(N,)`` f32.
Grid tiles tokens x N; K stays whole (K <= ~4k fits VMEM comfortably).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, sw_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # (BM, K)
    ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-6) / 127.0
    xq = jnp.round(x / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    o = acc.astype(jnp.float32) * sx * sw_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def quant_matmul(
    x: jnp.ndarray,  # (M, K)
    w_q: jnp.ndarray,  # (K, N) int8
    s_w: jnp.ndarray,  # (N,)
    block_m: int = 512,
    block_n: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    m, k = x.shape
    _, n = w_q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    if m % block_m or n % block_n:
        # fallback: plain XLA path for awkward shapes
        sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), -1, keepdims=True), 1e-6) / 127.0
        xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * s_w.astype(jnp.float32)).astype(x.dtype)

    return pl.pallas_call(
        _kernel,
        grid=(m // block_m, n // block_n),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n,), lambda i, j: (j,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, w_q, s_w)
