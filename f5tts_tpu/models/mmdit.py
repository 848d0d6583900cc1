"""MMDiT backbone (SD3-style dual-stream joint attention).

Re-design of ``model/backbones/mmdit.py:76-146`` + the JointAttnProcessor
(``model/modules.py:456-536``): text stream (c) and audio stream (x) carry
separate QKV/AdaLN params, attend jointly over the concatenated sequence
(text keys never masked), and split back; the last block is
``context_pre_only`` (no c-stream FF/out).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from f5tts_tpu.models import modules as m
from f5tts_tpu.models.dit import _stack
from f5tts_tpu.ops.attention import sdpa_xla
from f5tts_tpu.ops.rope import apply_rotary, precompute_freqs_cis, rotary_freqs


@dataclass(frozen=True)
class MMDiTConfig:
    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 4
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_max_pos: int = 1024  # mmdit.py:35
    attn_impl: str = "xla"
    conv_pos_impl: str = "xla"  # "xla" | "fused" (Pallas grouped kernel; serving only)


def _init_joint_attention(key, dim: int, heads: int, dim_head: int, context_pre_only: bool):
    ks = jax.random.split(key, 8)
    inner = heads * dim_head
    p = {
        "to_q": m.init_linear(ks[0], dim, inner),
        "to_k": m.init_linear(ks[1], dim, inner),
        "to_v": m.init_linear(ks[2], dim, inner),
        "to_q_c": m.init_linear(ks[3], dim, inner),
        "to_k_c": m.init_linear(ks[4], dim, inner),
        "to_v_c": m.init_linear(ks[5], dim, inner),
        "to_out": m.init_linear(ks[6], inner, dim),
    }
    if not context_pre_only:
        p["to_out_c"] = m.init_linear(ks[7], inner, dim)
    return p


def _init_block(key, cfg: MMDiTConfig, context_pre_only: bool):
    ks = jax.random.split(key, 5)
    p = {
        "attn_norm_c": (m.init_adaln_zero_final(ks[0], cfg.dim) if context_pre_only else m.init_adaln_zero(ks[0], cfg.dim)),
        "attn_norm_x": m.init_adaln_zero(ks[1], cfg.dim),
        "attn": _init_joint_attention(ks[2], cfg.dim, cfg.heads, cfg.dim_head, context_pre_only),
        "ff_x": m.init_feed_forward(ks[3], cfg.dim, cfg.ff_mult),
    }
    if not context_pre_only:
        p["ff_c"] = m.init_feed_forward(ks[4], cfg.dim, cfg.ff_mult)
    return p


def init_mmdit(key: jax.Array, cfg: MMDiTConfig):
    ks = jax.random.split(key, 7)
    return {
        "time_embed": m.init_timestep_embedding(ks[0], cfg.dim),
        "text_embed": m.init_embedding(ks[1], cfg.text_num_embeds + 1, cfg.dim),
        "audio_embed": {
            "proj": m.init_linear(ks[2], cfg.mel_dim * 2, cfg.dim),
            "conv_pos": m.init_conv_pos_embedding(ks[3], cfg.dim),
        },
        "blocks": _stack([_init_block(k, cfg, False) for k in jax.random.split(ks[4], cfg.depth - 1)]),
        "final_block": _init_block(ks[5], cfg, True),
        "norm_out": m.init_adaln_zero_final(jax.random.split(ks[6])[0], cfg.dim),
        "proj_out": m.init_linear(ks[6], cfg.dim, cfg.mel_dim),
    }


def _joint_attention(p, x, c, heads, freqs_x, freqs_c, mask, context_pre_only: bool):
    """modules.py:460-536 semantics incl. the flat-RoPE parity quirk."""
    b, n, _ = x.shape
    nt = c.shape[1]
    q = apply_rotary(m.linear(p["to_q"], x), freqs_x)
    k = apply_rotary(m.linear(p["to_k"], x), freqs_x)
    v = m.linear(p["to_v"], x)
    cq = apply_rotary(m.linear(p["to_q_c"], c), freqs_c)
    ck = apply_rotary(m.linear(p["to_k_c"], c), freqs_c)
    cv = m.linear(p["to_v_c"], c)

    q = jnp.concatenate([q, cq], axis=1)
    k = jnp.concatenate([k, ck], axis=1)
    v = jnp.concatenate([v, cv], axis=1)

    def split_heads(t):
        return t.reshape(b, n + nt, heads, -1).transpose(0, 2, 1, 3)

    key_mask = None
    if mask is not None:
        key_mask = jnp.pad(mask, ((0, 0), (0, nt)), constant_values=True)  # text keys unmasked
    o = sdpa_xla(split_heads(q), split_heads(k), split_heads(v), key_mask)
    o = o.transpose(0, 2, 1, 3).reshape(b, n + nt, -1)

    xo, co = o[:, :n], o[:, n:]
    xo = m.linear(p["to_out"], xo)
    if not context_pre_only:
        co = m.linear(p["to_out_c"], co)
    if mask is not None:
        xo = jnp.where(mask[..., None], xo, 0.0)
    return xo, co


def _block(p, x, c, t, heads, freqs_x, freqs_c, mask, context_pre_only: bool):
    if context_pre_only:
        norm_c = m.adaln_zero_final(p["attn_norm_c"], c, t)
    else:
        norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = m.adaln_zero(p["attn_norm_c"], c, t)
    norm_x, x_gate_msa, x_shift_mlp, x_scale_mlp, x_gate_mlp = m.adaln_zero(p["attn_norm_x"], x, t)

    x_attn, c_attn = _joint_attention(p["attn"], norm_x, norm_c, heads, freqs_x, freqs_c, mask, context_pre_only)

    if not context_pre_only:
        c = c + c_gate_msa[:, None] * c_attn
        norm_c = m.layer_norm(c) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        c = c + c_gate_mlp[:, None] * m.feed_forward(p["ff_c"], norm_c)
    else:
        c = None

    x = x + x_gate_msa[:, None] * x_attn
    norm_x = m.layer_norm(x) * (1 + x_scale_mlp[:, None]) + x_shift_mlp[:, None]
    x = x + x_gate_mlp[:, None] * m.feed_forward(p["ff_x"], norm_x)
    return x, c


def mmdit_text_embed(params, cfg: MMDiTConfig, text: jnp.ndarray, drop_text: jnp.ndarray):
    ids = jnp.where(drop_text[:, None], 0, text + 1)
    h = m.embedding(params["text_embed"], ids)
    table = jnp.asarray(precompute_freqs_cis(cfg.dim, cfg.text_max_pos))
    return h + table[: h.shape[1]][None].astype(h.dtype)


def mmdit_forward(
    params,
    cfg: MMDiTConfig,
    x: jnp.ndarray,
    cond: jnp.ndarray,
    text: jnp.ndarray | None,
    time: jnp.ndarray,
    drop_audio_cond: jnp.ndarray,
    drop_text: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    text_emb: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
    dropout_rng=None,  # accepted for trainer interface parity; dropout not yet applied in this backbone
) -> jnp.ndarray:
    b, n, _ = x.shape
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (b,))

    t = m.timestep_embedding(params["time_embed"], time.astype(compute_dtype))
    if text_emb is None:
        text_emb = mmdit_text_embed(params, cfg, text, drop_text)
    c = text_emb.astype(compute_dtype)

    cond = jnp.where(drop_audio_cond[:, None, None], 0.0, cond.astype(compute_dtype))
    h = m.linear(params["audio_embed"]["proj"], jnp.concatenate([x.astype(compute_dtype), cond], -1))
    h = m.conv_pos_embedding(params["audio_embed"]["conv_pos"], h, impl=cfg.conv_pos_impl) + h

    freqs_x = jnp.asarray(rotary_freqs(n, cfg.dim_head))
    freqs_c = jnp.asarray(rotary_freqs(c.shape[1], cfg.dim_head))

    @jax.checkpoint  # remat per block: O(1) block activations under grad
    def body(carry, blk):
        hh, cc = carry
        hh, cc = _block(blk, hh, cc, t, cfg.heads, freqs_x, freqs_c, mask, False)
        return (hh, cc), None

    (h, c), _ = lax.scan(body, (h, c), params["blocks"])
    h, _ = _block(params["final_block"], h, c, t, cfg.heads, freqs_x, freqs_c, mask, True)

    h = m.adaln_zero_final(params["norm_out"], h, t)
    return m.linear(params["proj_out"], h)
