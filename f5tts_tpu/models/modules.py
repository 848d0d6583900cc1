"""Building-block layers shared by the DiT / UNetT / MMDiT backbones.

Functional re-designs of the reference blocks (``model/modules.py``): each
layer is an ``init_*`` returning a param pytree plus an ``apply`` function.
Numerics are kept bit-compatible with the reference where checkpoints care:

- AdaLN-Zero: time emb -> SiLU -> Linear(dim -> 6*dim) chunked into
  shift/scale/gate pairs (``modules.py:276-290``).
- ConvNeXtV2: depthwise conv k=7 -> LN(eps 1e-6) -> pw1 -> exact GELU -> GRN ->
  pw2, residual (``modules.py:241-269``).
- ConvPositionEmbedding: 2x grouped Conv1d(k=31, groups=16) + Mish
  (``modules.py:167-190``).
- FeedForward uses *tanh* GELU (``modules.py:556``) while ConvNeXtV2 uses exact
  GELU — both preserved.

Weight layout conventions (JAX-native, converter transposes from torch):
Linear ``w: (in, out)``; Conv1d kernel ``(width, in/groups, out)`` for
``('NWC','WIO','NWC')`` dimension numbers; Embedding ``(vocab, dim)``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, d_in: int, d_out: int, bias: bool = True):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": _uniform(kw, (d_in, d_out), bound)}
    if bias:
        p["b"] = _uniform(kb, (d_out,), bound)
    return p


def linear(p, x):
    if "w_q" in p:
        return _linear_int8(p, x)
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _linear_int8(p, x):
    """W8A8 dynamic-quantized matmul: per-out-channel weight scales,
    per-token activation scales, int32 accumulation on the MXU (v5e int8 is
    2x bf16 throughput). Params: w_q int8 (in,out), s_w (out,), optional b."""
    s_x = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-8)
    xq = jnp.round(x.astype(jnp.float32) / s_x).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["w_q"], (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = (y.astype(jnp.float32) * s_x * p["s_w"].astype(jnp.float32)).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def quantize_linear_params(p):
    """fp Linear params -> int8 symmetric per-out-channel quantized form."""
    w = jnp.asarray(p["w"], jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out = {"w_q": wq, "s_w": s}
    if "b" in p:
        out["b"] = p["b"]
    return out


def init_embedding(key, n_vocab: int, dim: int):
    return {"w": jax.random.normal(key, (n_vocab, dim))}


def embedding(p, ids):
    return p["w"][ids]


def init_conv1d(key, d_in: int, d_out: int, width: int, groups: int = 1):
    kw, kb = jax.random.split(key)
    fan_in = (d_in // groups) * width
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": _uniform(kw, (width, d_in // groups, d_out), bound),
        "b": _uniform(kb, (d_out,), bound),
    }


def conv1d(p, x, groups: int = 1, padding: str | int = "SAME", dilation: int = 1):
    """``x: (b, n, c)`` channel-last 1-D convolution.

    Grouped/depthwise convs are expressed as a sum of shifted
    per-tap contractions rather than ``feature_group_count`` — the GSPMD
    partitioner double-counts grouped-conv weight gradients under a sharded
    batch (observed: exactly mesh-model-size x grads), and the shifted-matmul
    form is also the MXU/VPU-friendly layout.
    """
    if groups > 1:
        return _conv1d_grouped(p, x, groups, padding, dilation)
    pad = [(padding, padding)] if isinstance(padding, int) else padding
    y = lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return y + p["b"].astype(x.dtype)


def _conv1d_grouped(p, x, groups: int, padding: int, dilation: int = 1):
    b, n, c_in = x.shape
    w = p["w"].astype(x.dtype)  # (k, c_in/groups, c_out) or pre-densified (k, c_in, c_out)
    k, cg_in, c_out = w.shape
    assert isinstance(padding, int)
    x_pad = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    y = None
    if cg_in == c_in and groups > 1:
        # pre-densified block-diagonal kernel (densify_grouped_conv): k big
        # dense matmuls — the MXU-friendly serving path (~2.5x the grouped
        # einsum despite 16x the FLOPs; tiny per-group contractions starve
        # the systolic array)
        for i in range(k):
            tap = x_pad[:, i * dilation : i * dilation + n, :] @ w[i]
            y = tap if y is None else y + tap
        return y + p["b"].astype(x.dtype)
    if cg_in == 1 and c_out == c_in:  # depthwise: pure VPU multiply-add
        for i in range(k):
            tap = x_pad[:, i * dilation : i * dilation + n, :] * w[i, 0][None, None, :]
            y = tap if y is None else y + tap
        return y + p["b"].astype(x.dtype)
    co_g = c_out // groups
    # kernel (k, in/g, out): the group index lives in the OUTPUT axis
    wg = w.reshape(k, cg_in, groups, co_g)
    xg_shape = (b, n, groups, cg_in)
    for i in range(k):
        tap = x_pad[:, i * dilation : i * dilation + n, :].reshape(xg_shape)
        contrib = jnp.einsum("bngi,igo->bngo", tap, wg[i])
        y = contrib if y is None else y + contrib
    return y.reshape(b, n, c_out) + p["b"].astype(x.dtype)


def fuse_attention_qkv(attn_params):
    """Host-side, once: concat to_q/to_k/to_v into one (in, 3*inner) projection
    (one MXU launch per block instead of three). Works on stacked block params
    (leading depth axis) too. Inference-only transform."""
    q, k, v = attn_params["to_q"], attn_params["to_k"], attn_params["to_v"]
    fused = {"w": jnp.concatenate([q["w"], k["w"], v["w"]], axis=-1)}
    if "b" in q:
        fused["b"] = jnp.concatenate([q["b"], k["b"], v["b"]], axis=-1)
    return {"qkv": fused, "to_out": attn_params["to_out"]}


def densify_grouped_conv(p, groups: int):
    """Host-side, once: embed a grouped kernel ``(k, c_in/g, c_out)`` into its
    block-diagonal dense form ``(k, c_in, c_out)`` (inference-only speedup)."""
    import numpy as np

    w = np.asarray(p["w"])
    k, cg_in, c_out = w.shape
    if cg_in == 1 or groups == 1:
        return p  # depthwise/dense stay as-is
    c_in = cg_in * groups
    co_g = c_out // groups
    wg = w.reshape(k, cg_in, groups, co_g)
    dense = np.zeros((k, c_in, c_out), w.dtype)
    for g in range(groups):
        dense[:, g * cg_in : (g + 1) * cg_in, g * co_g : (g + 1) * co_g] = wg[:, :, g, :]
    return {**p, "w": jnp.asarray(dense)}


def layer_norm(x, eps: float = 1e-6, weight=None, bias=None):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(p, x, eps: float = 1e-8):
    """x-transformers RMSNorm: ``x * scale * g`` with unit-RMS normalization."""
    x32 = x.astype(jnp.float32)
    scale = x.shape[-1] ** 0.5
    normed = x32 * lax.rsqrt(jnp.maximum(jnp.sum(x32 * x32, -1, keepdims=True), eps)) * scale
    return (normed * p["g"].astype(jnp.float32)).astype(x.dtype)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


# ---------------------------------------------------------------------------
# timestep embedding (modules.py:149-161, 648-658)
# ---------------------------------------------------------------------------


def init_timestep_embedding(key, dim: int, freq_embed_dim: int = 256):
    k1, k2 = jax.random.split(key)
    return {"mlp1": init_linear(k1, freq_embed_dim, dim), "mlp2": init_linear(k2, dim, dim)}


def sinus_position_embedding(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """``(b,) -> (b, dim)``; reference SinusPositionEmbedding (scale 1000)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def timestep_embedding(p, time: jnp.ndarray, freq_embed_dim: int = 256) -> jnp.ndarray:
    h = sinus_position_embedding(time, freq_embed_dim).astype(time.dtype)
    h = linear(p["mlp1"], h)
    return linear(p["mlp2"], jax.nn.silu(h))


# ---------------------------------------------------------------------------
# conv position embedding (modules.py:167-190)
# ---------------------------------------------------------------------------


def init_conv_pos_embedding(key, dim: int, kernel_size: int = 31, groups: int = 16):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": init_conv1d(k1, dim, dim, kernel_size, groups),
        "conv2": init_conv1d(k2, dim, dim, kernel_size, groups),
    }


def conv_pos_embedding(p, x, mask=None, kernel_size: int = 31, groups: int = 16, impl: str = "xla"):
    """``impl='fused'`` takes the true-FLOP Pallas kernel
    (``ops/pallas/conv_pos.py`` — the densified XLA path does 16x the MACs);
    only valid outside sharded/pjit contexts. ``'xla'`` keeps the reference
    formulation (grouped einsum, or big dense matmuls on densified weights).

    ``mask`` must be a per-row PREFIX (duration) mask. It is applied to the
    input, BETWEEN the two convs, and to the output, so every valid frame
    computes exactly what the reference's batch-1 (unpadded) call computes
    with its zero conv boundary — rows are bucket-size invariant. (The
    reference's own batched mode skips all three masks, ``dit.py:86``, which
    is why its batched output drifts from its batch-1 output near row ends,
    ``cfm.py:179-180``.)"""
    pad = kernel_size // 2
    if mask is not None:
        x = jnp.where(mask[..., None], x, 0.0)
    w1 = p["conv1"]["w"]
    k, cg, c_out = w1.shape
    if (
        impl == "fused"
        and groups > 1
        and cg == c_out // groups  # grouped (not densified) weights
        and x.shape[-1] == c_out
        and k == kernel_size
        and cg % 8 == 0
    ):
        from f5tts_tpu.ops.pallas.conv_pos import conv_pos_pallas, pick_cluster, pick_tile

        if pick_tile(x.shape[1]) is not None and pick_cluster(groups, cg) is not None:
            if mask is None:
                # custom-vjp wrapper (trainable path)
                y = _conv_pos_fused(
                    x, w1, p["conv1"]["b"], p["conv2"]["w"], p["conv2"]["b"], groups, kernel_size
                )
            else:
                # serving path (never differentiated): per-row lens zero the
                # inter-conv scratch inside the kernel
                y = conv_pos_pallas(
                    x, w1, p["conv1"]["b"], p["conv2"]["w"], p["conv2"]["b"],
                    groups=groups, kernel_size=kernel_size,
                    lens=jnp.sum(mask, axis=-1).astype(jnp.int32),
                )
                y = jnp.where(mask[..., None], y, 0.0)
            return y
    y = mish(conv1d(p["conv1"], x, groups=groups, padding=pad))
    if mask is not None:
        y = jnp.where(mask[..., None], y, 0.0)
    y = mish(conv1d(p["conv2"], y, groups=groups, padding=pad))
    if mask is not None:
        y = jnp.where(mask[..., None], y, 0.0)
    return y


def _conv_pos_ref(x, w1, b1, w2, b2, groups: int, kernel_size: int):
    pad = kernel_size // 2
    y = mish(conv1d({"w": w1, "b": b1}, x, groups=groups, padding=pad))
    return mish(conv1d({"w": w2, "b": b2}, y, groups=groups, padding=pad))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _conv_pos_fused(x, w1, b1, w2, b2, groups: int, kernel_size: int):
    from f5tts_tpu.ops.pallas.conv_pos import conv_pos_pallas

    return conv_pos_pallas(x, w1, b1, w2, b2, groups=groups, kernel_size=kernel_size)


def _conv_pos_fused_fwd(x, w1, b1, w2, b2, groups: int, kernel_size: int):
    return _conv_pos_fused(x, w1, b1, w2, b2, groups, kernel_size), (x, w1, b1, w2, b2)


def _conv_pos_fused_bwd(groups, kernel_size, res, g):
    _, vjp = jax.vjp(lambda *a: _conv_pos_ref(*a, groups, kernel_size), *res)
    return vjp(g)


_conv_pos_fused.defvjp(_conv_pos_fused_fwd, _conv_pos_fused_bwd)


# ---------------------------------------------------------------------------
# GRN + ConvNeXtV2 (modules.py:225-269)
# ---------------------------------------------------------------------------


def init_convnext_v2_block(key, dim: int, intermediate_dim: int, dilation: int = 1):
    ks = jax.random.split(key, 4)
    return {
        "dwconv": init_conv1d(ks[0], dim, dim, 7, groups=dim),
        "norm_w": jnp.ones((dim,)),
        "norm_b": jnp.zeros((dim,)),
        "pw1": init_linear(ks[1], dim, intermediate_dim),
        "grn_gamma": jnp.zeros((intermediate_dim,)),
        "grn_beta": jnp.zeros((intermediate_dim,)),
        "pw2": init_linear(ks[2], intermediate_dim, dim),
    }


def grn(gamma, beta, x, mask=None):
    """Global response norm over the sequence axis (modules.py:231-234).

    GRN's L2 norm runs over ALL positions, so padded frames change every
    frame's output. ``mask`` (b, n) excludes padded positions from the norm,
    making a bucketed row compute exactly what the reference computes at the
    row's true length (its batch-1 serving mode)."""
    sq = jnp.square(x.astype(jnp.float32))
    if mask is not None:
        sq = jnp.where(mask[..., None], sq, 0.0)
    gx = jnp.sqrt(jnp.sum(sq, axis=1, keepdims=True))
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    nx = nx.astype(x.dtype)
    return gamma.astype(x.dtype) * (x * nx) + beta.astype(x.dtype) + x


def convnext_v2_block(p, x, dilation: int = 1, mask=None):
    """With ``mask``: valid frames see zero conv taps at the row boundary and
    a mask-restricted GRN norm — bit-equal to running the block unpadded at
    the row's length (the reference's batch-1 semantics); padded frames are
    zeroed so downstream convs/norms stay row-isolated."""
    if mask is not None:
        x = jnp.where(mask[..., None], x, 0.0)
    pad = (dilation * 6) // 2
    h = conv1d(p["dwconv"], x, groups=x.shape[-1], padding=pad, dilation=dilation)
    h = layer_norm(h, 1e-6, p["norm_w"], p["norm_b"])
    h = linear(p["pw1"], h)
    h = jax.nn.gelu(h, approximate=False)
    h = grn(p["grn_gamma"], p["grn_beta"], h, mask)
    h = linear(p["pw2"], h)
    out = x + h
    if mask is not None:
        out = jnp.where(mask[..., None], out, 0.0)
    return out


# ---------------------------------------------------------------------------
# AdaLayerNormZero (modules.py:276-311)
# ---------------------------------------------------------------------------


def init_adaln_zero(key, dim: int):
    return {"linear": init_linear(key, dim, dim * 6)}


def adaln_zero(p, x, emb):
    """Returns modulated x for attention plus (gate_msa, shift_mlp, scale_mlp, gate_mlp)."""
    mod = linear(p["linear"], jax.nn.silu(emb))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
    h = layer_norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    return h, gate_msa, shift_mlp, scale_mlp, gate_mlp


def init_adaln_zero_final(key, dim: int):
    return {"linear": init_linear(key, dim, dim * 2)}


def adaln_zero_final(p, x, emb):
    mod = linear(p["linear"], jax.nn.silu(emb))
    scale, shift = jnp.split(mod, 2, axis=-1)
    return layer_norm(x) * (1 + scale[:, None]) + shift[:, None]


# ---------------------------------------------------------------------------
# FeedForward (modules.py:317-328) — tanh GELU
# ---------------------------------------------------------------------------


def init_feed_forward(key, dim: int, mult: int = 4, dim_out: int | None = None):
    k1, k2 = jax.random.split(key)
    inner = int(dim * mult)
    return {"in": init_linear(k1, dim, inner), "out": init_linear(k2, inner, dim_out or dim)}


def dropout(x, rng, rate: float):
    """Inverted dropout (train-time only; callers pass rng=None at inference)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def feed_forward(p, x, dropout_rng=None, dropout_rate: float = 0.0):
    h = jax.nn.gelu(linear(p["in"], x), approximate=True)
    if dropout_rng is not None and dropout_rate > 0.0:
        # reference FeedForward: Sequential(Linear+GELU, Dropout, Linear)
        # (modules.py:317-328) — dropout sits between activation and out proj
        h = dropout(h, dropout_rng, dropout_rate)
    return linear(p["out"], h)


# ---------------------------------------------------------------------------
# Attention (modules.py:335-449)
# ---------------------------------------------------------------------------


def init_attention(key, dim: int, heads: int, dim_head: int):
    ks = jax.random.split(key, 4)
    inner = heads * dim_head
    return {
        "to_q": init_linear(ks[0], dim, inner),
        "to_k": init_linear(ks[1], dim, inner),
        "to_v": init_linear(ks[2], dim, inner),
        "to_out": init_linear(ks[3], inner, dim),
    }


def attention(p, x, heads: int, rope_freqs=None, mask=None, impl: str = "xla", rope_all_heads: bool = False,
              dropout_rng=None, dropout_rate: float = 0.0):
    """Self-attention with the reference's flat-RoPE parity quirk (see ops.rope)."""
    from f5tts_tpu.ops.attention import sdpa_xla
    from f5tts_tpu.ops.rope import apply_rotary_per_head

    b, n, _ = x.shape
    if "qkv" in p:  # fused projection layout (fuse_attention_qkv; off by default — benched slower)
        qkv = linear(p["qkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear(p["to_q"], x)
        k = linear(p["to_k"], x)
        v = linear(p["to_v"], x)

    if impl != "flash" and rope_freqs is not None and not rope_all_heads:
        # reference parity quirk: RoPE on the flat pre-split projection touches
        # only the first dim_head channels (head 0)
        from f5tts_tpu.ops.rope import apply_rotary

        q = apply_rotary(q, rope_freqs)
        k = apply_rotary(k, rope_freqs)

    def split_heads(t):
        return t.reshape(b, n, heads, -1).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    if impl != "flash" and rope_freqs is not None and rope_all_heads:
        q = apply_rotary_per_head(q, rope_freqs)
        k = apply_rotary_per_head(k, rope_freqs)

    if impl == "flash":
        rf = jnp.asarray(rope_freqs) if rope_freqs is not None else None
        if dropout_rng is not None:
            # training forward: differentiable kernels (custom-VJP flash);
            # rope applied at XLA level — its gradient is then automatic
            from f5tts_tpu.ops.pallas.flash_attention import flash_attention_train
            from f5tts_tpu.ops.rope import apply_rotary_per_head

            if rf is not None:
                if rope_all_heads:
                    q = apply_rotary_per_head(q, rf)
                    k = apply_rotary_per_head(k, rf)
                else:
                    q = jnp.concatenate([apply_rotary_per_head(q[:, :1], rf), q[:, 1:]], 1)
                    k = jnp.concatenate([apply_rotary_per_head(k[:, :1], rf), k[:, 1:]], 1)
            o = flash_attention_train(q, k, v, mask)
        else:
            from f5tts_tpu.ops.pallas.flash_attention import flash_attention

            # serving: rope rides into the kernel (saves an HBM q/k rewrite)
            o = flash_attention(q, k, v, mask, rope_freqs=rf, rope_all_heads=rope_all_heads)
    elif impl == "ring":
        # context-parallel: sequence axis sharded over the ambient mesh's
        # 'cp' axis (jax.sharding.set_mesh); see parallel/ring_attention.py
        from f5tts_tpu.parallel.ring_attention import ring_attention

        o = ring_attention(q, k, v, mask)
    else:
        o = sdpa_xla(q, k, v, mask)

    o = o.transpose(0, 2, 1, 3).reshape(b, n, -1)
    o = linear(p["to_out"], o)
    if dropout_rng is not None and dropout_rate > 0.0:
        # reference Attention.to_out = [Linear, Dropout] (modules.py:371-373)
        o = dropout(o, dropout_rng, dropout_rate)
    if mask is not None:
        o = jnp.where(mask[..., None], o, 0.0)
    return o


# ---------------------------------------------------------------------------
# DiT block (modules.py:542-572)
# ---------------------------------------------------------------------------


def init_dit_block(key, dim: int, heads: int, dim_head: int, ff_mult: int):
    ks = jax.random.split(key, 3)
    return {
        "attn_norm": init_adaln_zero(ks[0], dim),
        "attn": init_attention(ks[1], dim, heads, dim_head),
        "ff": init_feed_forward(ks[2], dim, ff_mult),
    }


def dit_block(p, x, t_emb, heads: int, rope_freqs=None, mask=None, impl: str = "xla", rope_all_heads: bool = False,
              dropout_rngs=None, dropout_rate: float = 0.0):
    attn_rng = ff_rng = None
    if dropout_rngs is not None:
        attn_rng, ff_rng = dropout_rngs[0], dropout_rngs[1]
    norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = adaln_zero(p["attn_norm"], x, t_emb)
    attn_out = attention(p["attn"], norm, heads, rope_freqs, mask, impl, rope_all_heads,
                         dropout_rng=attn_rng, dropout_rate=dropout_rate)
    x = x + gate_msa[:, None] * attn_out
    norm = layer_norm(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    x = x + gate_mlp[:, None] * feed_forward(p["ff"], norm, dropout_rng=ff_rng, dropout_rate=dropout_rate)
    return x
