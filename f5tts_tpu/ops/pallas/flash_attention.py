"""Flash attention for TPU (Pallas/Mosaic): bidirectional, key-padding masked.

The #1 kernel target (SURVEY §2.2): the reference leans on torch SDPA /
flash-attn wheels (``model/modules.py:436``); this is the native equivalent,
shaped for the DiT sampling loop:

- **non-causal** — no causal early-exit exists; every q-block visits every
  k-block (full O(n^2) tiles, online softmax keeps memory O(block)).
- **key-padding mask only** (``modules.py:429-434``): one additive bias per
  (batch, key) — padded *query* rows compute garbage and are zeroed by the
  caller, exactly like the reference.
- q/k/v stay ``(b, h, n, d)``; grid is ``(b*h, n/BLOCK_Q)``; k/v for the whole
  row live in VMEM (n<=4096, d=64, bf16 -> 0.5 MB each), q is tiled.
- fp32 accumulate; ``preferred_element_type=f32`` on both MXU contractions.

Falls back to interpreter mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024


def _flash_single_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Single-pass path when the whole key row fits one block: plain softmax,
    no online-accumulation carries."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _rot(x, cos, sin):
    """Half-split rotary: x*cos + rotate_half(x)*sin on a (rows, d) tile."""
    half = x.shape[-1] // 2
    rh = jnp.concatenate([-x[:, half:], x[:, :half]], axis=1)
    return x * cos + rh * sin


def _maybe_rope_pair(q_ref, k_ref, cos_ref, sin_ref, *, h: int, rope_all: bool, block_q: int):
    """Fused RoPE for a head pair: the reference ropes only head 0 (the flat
    pre-split quirk, model/modules.py:414-419 — see ops/rope.py), so head A is
    rotated only when this grid cell's pair starts at head 0; head B (odd flat
    index) is rotated only under ``rope_all``. Fusing here removes the
    full-HBM q/k rewrite the XLA-level rope costs (~5 ms/step at b=16)."""
    g = pl.program_id(0)
    qi = pl.program_id(1)
    dt = q_ref.dtype
    cos_q = cos_ref[pl.ds(qi * block_q, block_q)].astype(dt)
    sin_q = sin_ref[pl.ds(qi * block_q, block_q)].astype(dt)
    cos_k = cos_ref[:].astype(dt)
    sin_k = sin_ref[:].astype(dt)
    qa, qb = q_ref[0], q_ref[1]
    ka, kb = k_ref[0], k_ref[1]
    if rope_all:
        return _rot(qa, cos_q, sin_q), _rot(qb, cos_q, sin_q), _rot(ka, cos_k, sin_k), _rot(kb, cos_k, sin_k)
    is_head0 = ((2 * g) % h) == 0
    qa = jnp.where(is_head0, _rot(qa, cos_q, sin_q), qa)
    ka = jnp.where(is_head0, _rot(ka, cos_k, sin_k), ka)
    return qa, qb, ka, kb


def _flash_packed_kernel(bias_ref, q_ref, k_ref, v_ref, *rest, scale: float,
                         fuse_rope: bool = False, h: int = 0, rope_all: bool = False):
    """Two heads per kernel instance, packed block-diagonally so both MXU
    contractions run at K=128 instead of K=64.

    s' = [qa|qb] @ [[ka,0],[0,kb]]^T = [sa | sb]  (BQ, 2n), contraction 128
    o' = p' @ [[va,0],[0,vb]]        = [oa | ob]  (BQ, 128)

    2x the MACs of the per-head form (the zero blocks are real work), but
    K=128 is ~2.3x more efficient per MAC on the 128x128 MXU: the bare
    matmuls measure 14% faster (1.45 vs 1.68 ms at b*h=256, n=1024, v5e).
    With the per-half softmax on static slices the full kernel measures
    1.574 vs 1.684 ms (+6.5%); a where-mask softmax variant ate the whole
    win (see BENCH.md for the ablation). Heads arrive as one block spanning
    the pair (leading block dim 2 on the flat (b*h, n, d) arrays), so there
    is no HBM re-layout: q/k/v/o blocks span the head pair (leading block dim
    2 on the flat (b*h, n, d) arrays), so outputs land in place with no
    interleave. Single-pass only (whole key row in VMEM). With ``fuse_rope``
    the kernel also applies RoPE to its q/k tiles in VMEM
    (``_maybe_rope_pair``)."""
    if fuse_rope:
        cos_ref, sin_ref, o_ref = rest
        qa, qb, ka, kb = _maybe_rope_pair(
            q_ref, k_ref, cos_ref, sin_ref, h=h, rope_all=rope_all, block_q=q_ref.shape[1])
    else:
        (o_ref,) = rest
        qa, qb, ka, kb = q_ref[0], q_ref[1], k_ref[0], k_ref[1]
    n = k_ref.shape[1]
    d = q_ref.shape[-1]
    q2 = jnp.concatenate([qa, qb], axis=1)  # (BQ, 2d)
    z = jnp.zeros((n, d), k_ref.dtype)
    kp = jnp.concatenate(
        [jnp.concatenate([ka, z], 1), jnp.concatenate([z, kb], 1)], 0)  # (2n, 2d)
    s = jax.lax.dot_general(
        q2, kp, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, 2n)
    bias = bias_ref[0]  # (1, n) — same batch row for both heads
    # per-half softmax on static slices (cheaper than masked full-width ops)
    sa = s[:, :n] + bias
    sb = s[:, n:] + bias
    ma = jnp.max(sa, -1, keepdims=True)
    mb = jnp.max(sb, -1, keepdims=True)
    pa = jnp.exp(sa - ma)
    pb = jnp.exp(sb - mb)
    la = jnp.sum(pa, -1, keepdims=True)
    lb = jnp.sum(pb, -1, keepdims=True)
    p = jnp.concatenate([pa, pb], axis=1)
    vp = jnp.concatenate(
        [jnp.concatenate([v_ref[0], z], 1), jnp.concatenate([z, v_ref[1]], 1)], 0)  # (2n, 2d)
    o = jax.lax.dot_general(
        p.astype(vp.dtype), vp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, 2d)
    o_ref[0] = (o[:, :d] / jnp.maximum(la, 1e-30)).astype(o_ref.dtype)
    o_ref[1] = (o[:, d:] / jnp.maximum(lb, 1e-30)).astype(o_ref.dtype)


def _flash_packed_multi_kernel(bias_ref, q_ref, k_ref, v_ref, *rest, block_k: int, scale: float,
                               fuse_rope: bool = False, h: int = 0, rope_all: bool = False):
    """Head-pair packed variant of the online-softmax kernel (n > one block):
    same block-diagonal K=128 trick as ``_flash_packed_kernel``, with separate
    (m, l) running stats per half and one shared (BQ, 2d) accumulator."""
    dt = q_ref.dtype
    if fuse_rope:
        cos_ref, sin_ref, o_ref = rest
        g = pl.program_id(0)
        qi = pl.program_id(1)
        bq_ = q_ref.shape[1]
        cos_q = cos_ref[pl.ds(qi * bq_, bq_)].astype(dt)
        sin_q = sin_ref[pl.ds(qi * bq_, bq_)].astype(dt)
        if rope_all:
            is_head0 = None
            qa_r, qb_r = _rot(q_ref[0], cos_q, sin_q), _rot(q_ref[1], cos_q, sin_q)
        else:
            is_head0 = ((2 * g) % h) == 0
            qa_r = jnp.where(is_head0, _rot(q_ref[0], cos_q, sin_q), q_ref[0])
            qb_r = q_ref[1]
    else:
        (o_ref,) = rest
        qa_r, qb_r = q_ref[0], q_ref[1]
    n = k_ref.shape[1]
    d = q_ref.shape[-1]
    num_kb = n // block_k
    q2 = jnp.concatenate([qa_r, qb_r], axis=1)  # (BQ, 2d)
    bq = q2.shape[0]

    ma = jnp.full((bq, 1), NEG_INF, jnp.float32)
    mb = jnp.full((bq, 1), NEG_INF, jnp.float32)
    la = jnp.zeros((bq, 1), jnp.float32)
    lb = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, 2 * d), jnp.float32)

    def body(kb, carry):
        ma, mb, la, lb, acc = carry
        ka = k_ref[0, pl.ds(kb * block_k, block_k), :]
        kb_ = k_ref[1, pl.ds(kb * block_k, block_k), :]
        if fuse_rope:
            cos_b = cos_ref[pl.ds(kb * block_k, block_k)].astype(dt)
            sin_b = sin_ref[pl.ds(kb * block_k, block_k)].astype(dt)
            if rope_all:
                ka, kb_ = _rot(ka, cos_b, sin_b), _rot(kb_, cos_b, sin_b)
            else:
                ka = jnp.where(is_head0, _rot(ka, cos_b, sin_b), ka)
        va = v_ref[0, pl.ds(kb * block_k, block_k), :]
        vb = v_ref[1, pl.ds(kb * block_k, block_k), :]
        bias = bias_ref[0, :, pl.ds(kb * block_k, block_k)]  # (1, BK)

        z = jnp.zeros((block_k, d), ka.dtype)
        kp = jnp.concatenate([jnp.concatenate([ka, z], 1), jnp.concatenate([z, kb_], 1)], 0)
        s = jax.lax.dot_general(
            q2, kp, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, 2*BK)
        sa = s[:, :block_k] + bias
        sb = s[:, block_k:] + bias

        ma_new = jnp.maximum(ma, jnp.max(sa, -1, keepdims=True))
        mb_new = jnp.maximum(mb, jnp.max(sb, -1, keepdims=True))
        alpha_a = jnp.exp(ma - ma_new)
        alpha_b = jnp.exp(mb - mb_new)
        pa = jnp.exp(sa - ma_new)
        pb = jnp.exp(sb - mb_new)
        la_new = la * alpha_a + jnp.sum(pa, -1, keepdims=True)
        lb_new = lb * alpha_b + jnp.sum(pb, -1, keepdims=True)

        vp = jnp.concatenate([jnp.concatenate([va, z], 1), jnp.concatenate([z, vb], 1)], 0)
        p = jnp.concatenate([pa, pb], axis=1)
        # acc halves rescale independently (left d cols = head A, right = head B)
        alpha2 = jnp.concatenate(
            [jnp.broadcast_to(alpha_a, (bq, d)), jnp.broadcast_to(alpha_b, (bq, d))], 1)
        acc_new = acc * alpha2 + jax.lax.dot_general(
            p.astype(vp.dtype), vp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return ma_new, mb_new, la_new, lb_new, acc_new

    ma, mb, la, lb, acc = jax.lax.fori_loop(0, num_kb, body, (ma, mb, la, lb, acc))
    o_ref[0] = (acc[:, :d] / jnp.maximum(la, 1e-30)).astype(o_ref.dtype)
    o_ref[1] = (acc[:, d:] / jnp.maximum(lb, 1e-30)).astype(o_ref.dtype)


def _flash_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    q = q_ref[0]  # (BQ, d)
    n = k_ref.shape[1]
    num_kb = n // block_k

    bq = q.shape[0]
    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, q.shape[-1]), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        bias = bias_ref[0, :, pl.ds(kb * block_k, block_k)]  # (1, BK) additive 0/-inf

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK)
        s = s + bias

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret", "packed", "rope_all_heads"))
def flash_attention(
    q: jnp.ndarray,  # (b, h, n, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray | None = None,  # (b, n) bool
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
    packed: bool = True,  # head-pair packing (single-pass, even heads): +6.5% on the n² core
    rope_freqs: jnp.ndarray | None = None,  # (n, d): fuse RoPE into the kernel (packed path)
    rope_all_heads: bool = False,  # False = reference head-0-only quirk (ops/rope.py)
) -> jnp.ndarray:
    b, h, n, d = q.shape

    def rope_xla(q, k):
        """Fallback rope at XLA level (same semantics the kernel fuses)."""
        if rope_freqs is None:
            return q, k
        cos = jnp.cos(rope_freqs).astype(q.dtype)
        sin = jnp.sin(rope_freqs).astype(q.dtype)

        def rot4(t):
            half = d // 2
            rh = jnp.concatenate([-t[..., half:], t[..., :half]], -1)
            return t * cos + rh * sin

        if rope_all_heads:
            return rot4(q), rot4(k)
        return (
            jnp.concatenate([rot4(q[:, :1]), q[:, 1:]], 1),
            jnp.concatenate([rot4(k[:, :1]), k[:, 1:]], 1),
        )
    # adapt blocks to the bucket: largest candidate that divides n (e.g. the
    # 768/1536 buckets use 256/384-wide tiles instead of falling back to XLA)
    if n % block_q:
        block_q = next((c for c in (512, 384, 256, 128) if c <= n and n % c == 0), None)
    else:
        block_q = min(block_q, n)
    if n <= 1024:
        block_k = n
    elif n % block_k:
        block_k = next((c for c in (1024, 768, 512, 384, 256) if n % c == 0), None)
    else:
        block_k = min(block_k, n)
    if block_q is None or block_k is None or n % 128:
        from f5tts_tpu.ops.attention import sdpa_xla

        q, k = rope_xla(q, k)
        return sdpa_xla(q, k, v, key_mask)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    scale = d**-0.5
    if key_mask is None:
        bias = jnp.zeros((b, 1, n), jnp.float32)
    else:
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    def flat(t):
        return t.reshape(b * h, n, d)

    if packed and h % 2 == 0 and d <= 64:
        # even heads: pack head pairs block-diagonally so both MXU
        # contractions run full-depth (see _flash_packed_kernel); blocks span
        # the pair (leading dim 2), outputs land in place; RoPE (when given)
        # is applied to the VMEM tiles inside the kernel, saving the full
        # HBM q/k rewrite of an XLA-level rope
        fuse_rope = rope_freqs is not None
        grid = (b * h // 2, n // block_q)
        common = dict(scale=scale, fuse_rope=fuse_rope, h=h, rope_all=rope_all_heads)
        kernel = (
            functools.partial(_flash_packed_kernel, **common)
            if block_k == n
            else functools.partial(_flash_packed_multi_kernel, block_k=block_k, **common)
        )
        in_specs = [
            pl.BlockSpec((1, 1, n), lambda g, qi: (2 * g // h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_q, d), lambda g, qi: (g, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n, d), lambda g, qi: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n, d), lambda g, qi: (g, 0, 0), memory_space=pltpu.VMEM),
        ]
        operands = [bias, flat(q), flat(k), flat(v)]
        if fuse_rope:
            table_spec = pl.BlockSpec((n, d), lambda g, qi: (0, 0), memory_space=pltpu.VMEM)
            in_specs += [table_spec, table_spec]
            operands += [jnp.cos(rope_freqs).astype(jnp.float32), jnp.sin(rope_freqs).astype(jnp.float32)]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((2, block_q, d), lambda g, qi: (g, qi, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
            interpret=interpret,
        )(*operands)
        return out.reshape(b, h, n, d)

    q, k = rope_xla(q, k)
    grid = (b * h, n // block_q)
    kernel = (
        functools.partial(_flash_single_kernel, scale=scale)
        if block_k == n
        else functools.partial(_flash_kernel, block_k=block_k, scale=scale)
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda bh, qi: (bh // h, 0, 0), memory_space=pltpu.VMEM),  # bias per batch row
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        interpret=interpret,
        # NOTE: no cost_estimate — it hangs this environment's remote Mosaic
        # compile (reproduced: identical kernel compiles in 0.5 s without it).
    )(bias, flat(q), flat(k), flat(v))
    return out.reshape(b, h, n, d)


# ---------------------------------------------------------------------------
# Differentiable flash attention (training path)
# ---------------------------------------------------------------------------
# The serving kernels above are forward-only (pallas_call has no autodiff
# rule). For training, `flash_attention_train` pairs a forward kernel that
# also emits the per-row logsumexp with a whole-row backward kernel
# (FlashAttention-2 style: recompute P from (q, k, lse), then
# dv = P^T do, dS = P (do v^T - D), dq = dS k, dk = dS^T q with
# D = rowsum(do * o)), wrapped in jax.custom_vjp. Neither pass materializes
# the n^2 matrix in HBM — the XLA SDPA backward does, which is what bounds
# training micro-batches (BENCH.md). Single-pass shapes only (whole key row
# in VMEM, n <= 1024); larger n falls back to XLA SDPA.


def _flash_fwd_lse_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _flash_bwd_kernel(bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0]
    p = jnp.exp(s - lse_ref[0])  # (n, n) rows normalized by saved lse
    dv = jax.lax.dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # p^T @ do
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0])  # (n, n) f32
    ds_c = ds.astype(q.dtype)
    dq = jax.lax.dot_general(ds_c, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds_c, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _train_supported(n: int, d: int) -> bool:
    return n <= 1024 and n % 128 == 0 and d <= 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_train_core(q, k, v, bias, interpret):
    o, _ = _flash_train_fwd_impl(q, k, v, bias, interpret)
    return o


def _flash_train_fwd_impl(q, k, v, bias, interpret):
    b, h, n, d = q.shape
    block_q = next(c for c in (512, 384, 256, 128) if c <= n and n % c == 0)

    def flat(t):
        return t.reshape(b * h, n, d)

    o, lse = pl.pallas_call(
        functools.partial(_flash_fwd_lse_kernel, scale=d**-0.5),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda bh, qi: (bh // h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(bias, flat(q), flat(k), flat(v))
    return o.reshape(b, h, n, d), lse.reshape(b, h, n, 1)


def _flash_train_fwd(q, k, v, bias, interpret):
    o, lse = _flash_train_fwd_impl(q, k, v, bias, interpret)
    return o, (q, k, v, bias, o, lse)


def _flash_train_bwd(interpret, res, do):
    q, k, v, bias, o, lse = res
    b, h, n, d = q.shape
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)

    def flat(t):
        return t.reshape(b * h, n, -1)

    row = pl.BlockSpec((1, n, d), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((1, n, 1), lambda bh: (bh, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=d**-0.5),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda bh: (bh // h, 0, 0), memory_space=pltpu.VMEM),
            row, row, row, row, col, col,
        ],
        out_specs=[row, row, row],
        out_shape=[jax.ShapeDtypeStruct((b * h, n, d), q.dtype)] * 3,
        interpret=interpret,
    )(bias, flat(q), flat(k), flat(v), flat(do), flat(lse), flat(delta))
    shape = (b, h, n, d)
    return dq.reshape(shape), dk.reshape(shape), dv.reshape(shape), jnp.zeros_like(bias)


_flash_train_core.defvjp(_flash_train_fwd, _flash_train_bwd)


def flash_attention_train(
    q: jnp.ndarray,  # (b, h, n, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Differentiable flash attention (training). Falls back to XLA SDPA when
    the shape doesn't fit the single-pass kernels."""
    b, h, n, d = q.shape
    if not _train_supported(n, d):
        from f5tts_tpu.ops.attention import sdpa_xla

        return sdpa_xla(q, k, v, key_mask)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if key_mask is None:
        bias = jnp.zeros((b, 1, n), jnp.float32)
    else:
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    return _flash_train_core(q, k, v, bias, interpret)
