"""UNetT backbone (E2-TTS flavor): flat transformer with U-Net skip connections.

Re-design of ``model/backbones/unett.py:96-219``:
- time embedding is prepended as a sequence token (``unett.py:184-188``), mask
  left-padded with True;
- RMSNorm pre-norm attention/FF blocks;
- first-half hidden states are stacked by a `lax.scan` and consumed LIFO by the
  second half (concat + Linear, or add) — the reference's Python list
  push/pop (``unett.py:193-209``) expressed as two scans.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from f5tts_tpu.models import modules as m
from f5tts_tpu.models.dit import _stack, text_embed as dit_text_embed
from f5tts_tpu.ops.rope import rotary_freqs


@dataclass(frozen=True)
class UNetTConfig:
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 4
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_dim: int = 512
    conv_layers: int = 4
    skip_connect_type: str = "concat"  # "concat" | "add" | "none"
    max_pos: int = 4096
    attn_impl: str = "xla"
    conv_pos_impl: str = "xla"  # "xla" | "fused" (Pallas grouped kernel; serving only)
    rope_all_heads: bool = False

    @staticmethod
    def base() -> "UNetTConfig":
        """E2-TTS Base: 333.2M params (`infer/infer_cli.py:153`)."""
        return UNetTConfig()

    @staticmethod
    def small() -> "UNetTConfig":
        """E2-TTS Small (`configs/E2TTS_Small_train.yaml`)."""
        return UNetTConfig(dim=768, depth=20, heads=12, dim_head=64, ff_mult=4)


def _init_half_block(key, cfg: UNetTConfig, with_skip: bool):
    ks = jax.random.split(key, 5)
    p = {
        "attn_norm": {"g": jnp.ones((cfg.dim,))},
        "attn": m.init_attention(ks[0], cfg.dim, cfg.heads, cfg.dim_head),
        "ff_norm": {"g": jnp.ones((cfg.dim,))},
        "ff": m.init_feed_forward(ks[1], cfg.dim, cfg.ff_mult),
    }
    if with_skip:
        p["skip_proj"] = m.init_linear(ks[2], cfg.dim * 2, cfg.dim, bias=False)
    return p


def init_unett(key: jax.Array, cfg: UNetTConfig):
    assert cfg.depth % 2 == 0, "UNetT depth must be even"
    ks = jax.random.split(key, 8)
    half = cfg.depth // 2
    needs_skip = cfg.skip_connect_type == "concat"
    return {
        "time_embed": m.init_timestep_embedding(ks[0], cfg.dim),
        "text_embed": {
            "embed": m.init_embedding(ks[1], cfg.text_num_embeds + 1, cfg.text_dim),
            "blocks": _stack(
                [
                    m.init_convnext_v2_block(k, cfg.text_dim, cfg.text_dim * 2)
                    for k in jax.random.split(ks[2], cfg.conv_layers)
                ]
            )
            if cfg.conv_layers > 0
            else None,
        },
        "input_embed": {
            "proj": m.init_linear(ks[3], cfg.mel_dim * 2 + cfg.text_dim, cfg.dim),
            "conv_pos": m.init_conv_pos_embedding(ks[4], cfg.dim),
        },
        "first_half": _stack([_init_half_block(k, cfg, False) for k in jax.random.split(ks[5], half)]),
        "second_half": _stack([_init_half_block(k, cfg, needs_skip) for k in jax.random.split(ks[6], half)]),
        "norm_out": {"g": jnp.ones((cfg.dim,))},
        "proj_out": m.init_linear(ks[7], cfg.dim, cfg.mel_dim),
    }


def unett_embed(params, cfg: UNetTConfig, text, seq_len: int, drop_text, valid_mask=None):
    # same TextEmbedding wiring as DiT (unett.py:35-72)
    from f5tts_tpu.models.dit import DiTConfig

    proxy = DiTConfig(text_dim=cfg.text_dim, max_pos=cfg.max_pos)
    return dit_text_embed(params, proxy, text, seq_len, drop_text, valid_mask)


def unett_forward(
    params,
    cfg: UNetTConfig,
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
        text_emb = unett_embed(params, cfg, text, n, drop_text, valid_mask=mask)

    x = x.astype(compute_dtype)
    cond = jnp.where(drop_audio_cond[:, None, None], 0.0, cond.astype(compute_dtype))
    h = m.linear(params["input_embed"]["proj"], jnp.concatenate([x, cond, text_emb.astype(compute_dtype)], -1))
    h = m.conv_pos_embedding(params["input_embed"]["conv_pos"], h, mask, impl=cfg.conv_pos_impl) + h

    # prepend time token (unett.py:184-188)
    h = jnp.concatenate([t[:, None, :], h], axis=1)
    if mask is not None:
        mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
    n1 = n + 1
    # The time token makes the sequence n+1, which breaks the flash kernels'
    # n % 128 requirement — an unpadded 1025 silently fell back to XLA
    # attention (~2.6x the attention cost; found by the round-3 E2TTS bench).
    # Pad to the next 128 multiple: padded KEYS are masked out, padded query
    # rows compute garbage and are sliced off with the time token at the end.
    pad = (-n1) % 128
    if pad and cfg.attn_impl == "flash":
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        if mask is None:
            mask = jnp.broadcast_to(jnp.arange(n1 + pad)[None, :] < n1, (b, n1 + pad))
        else:
            mask = jnp.pad(mask, ((0, 0), (0, pad)), constant_values=False)
        n1 = n1 + pad

    freqs = jnp.asarray(rotary_freqs(n1, cfg.dim_head))

    def attn_ff(blk, hh):
        a = m.attention(
            blk["attn"], m.rms_norm(blk["attn_norm"], hh), cfg.heads, freqs, mask,
            impl=cfg.attn_impl, rope_all_heads=cfg.rope_all_heads,
        )
        hh = a + hh
        return m.feed_forward(blk["ff"], m.rms_norm(blk["ff_norm"], hh)) + hh

    @jax.checkpoint  # remat per block: O(1) block activations under grad
    def first_body(carry, blk):
        out = attn_ff(blk, carry)
        return out, carry  # push pre-block state as the skip (unett.py:200-201)

    h, skips = lax.scan(first_body, h, params["first_half"])

    # LIFO: reverse the stacked skips along depth
    skips = jax.tree.map(lambda s: s[::-1], skips)

    @jax.checkpoint
    def second_body(carry, inp):
        blk, skip = inp
        if cfg.skip_connect_type == "concat":
            carry = m.linear(blk["skip_proj"], jnp.concatenate([carry, skip], axis=-1))
        elif cfg.skip_connect_type == "add":
            carry = carry + skip
        return attn_ff(blk, carry), None

    h, _ = lax.scan(second_body, h, (params["second_half"], skips))

    h = m.rms_norm(params["norm_out"], h)[:, 1 : n + 1, :]
    return m.linear(params["proj_out"], h)
