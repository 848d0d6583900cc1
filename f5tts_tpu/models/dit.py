"""DiT backbone (F5-TTS flavor) — AdaLN-Zero diffusion transformer.

Re-design of the reference DiT (``model/backbones/dit.py:93-163``):

- TextEmbedding: char embedding (+1 shift, 0 = filler for the -1 padding) +
  absolute sin/cos table + ``conv_layers`` ConvNeXtV2 blocks
  (``dit.py:32-69``).
- InputEmbedding: ``Linear(concat(x, cond, text)) `` + grouped-conv position
  embedding with residual (``dit.py:75-87``).
- ``depth`` DiT blocks under one ``lax.scan`` over stacked params (one trace,
  one compile — vs. the reference's Python loop over 22 modules), rotary
  embedding per sequence length, AdaLN-Zero final + Linear -> mel.

TPU-first deltas from the reference:
- CFG drop flags are *per-sample arrays*, not Python bools, so the cond/null
  CFG pair runs as one batched forward (the reference runs two sequential
  forwards per ODE step, ``model/cfm.py:167-176``).
- Text & input embeddings are exposed separately (``dit_embed``) so the ODE
  sampler can lift them out of the 32-step loop — the reference recomputes the
  text ConvNeXt stack every step (``dit.py:146-147``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from f5tts_tpu.models import modules as m
from f5tts_tpu.ops.rope import precompute_freqs_cis, rotary_freqs


@dataclass(frozen=True)
class DiTConfig:
    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 2
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_dim: int = 512
    conv_layers: int = 4
    dropout: float = 0.1  # train-time attention/FF dropout (DiTBlock default)
    long_skip_connection: bool = False
    max_pos: int = 4096  # abs-pos/RoPE table horizon (~44 s at 93.75 fps)
    attn_impl: str = "xla"  # "xla" | "flash"
    conv_pos_impl: str = "xla"  # "xla" | "fused" (Pallas true-FLOP grouped kernel; serving only)
    rope_all_heads: bool = False  # False = reference parity (head-0-only RoPE)

    @staticmethod
    def base() -> "DiTConfig":
        """F5-TTS Base: 335.8 M params (`infer/infer_cli.py:136`)."""
        return DiTConfig()

    @staticmethod
    def small() -> "DiTConfig":
        return DiTConfig(dim=768, depth=18, heads=12, ff_mult=2, text_dim=512, conv_layers=4)


def init_dit(key: jax.Array, cfg: DiTConfig):
    ks = jax.random.split(key, 8)
    params = {
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
        "blocks": _stack(
            [
                m.init_dit_block(k, cfg.dim, cfg.heads, cfg.dim_head, cfg.ff_mult)
                for k in jax.random.split(ks[5], cfg.depth)
            ]
        ),
        "norm_out": m.init_adaln_zero_final(ks[6], cfg.dim),
        "proj_out": m.init_linear(ks[7], cfg.dim, cfg.mel_dim),
    }
    if cfg.long_skip_connection:
        params["long_skip"] = m.init_linear(jax.random.split(ks[7])[0], cfg.dim * 2, cfg.dim, bias=False)
    return params


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def text_embed(
    params, cfg: DiTConfig, text: jnp.ndarray, seq_len: int, drop_text: jnp.ndarray,
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``(b, nt) int32 (pad = -1)`` -> ``(b, seq_len, text_dim)``.

    Matches ``dit.py:47-69``: +1 shift, curtail/pad to ``seq_len`` with filler 0,
    CFG drop -> all-filler, abs sin/cos position table, ConvNeXtV2 stack.
    ``drop_text``: bool ``(b,)`` array (fused-CFG design).

    ``valid_mask`` (b, seq_len): each row's true frame count inside the padded
    bucket. The reference serves batch 1 with seq_len == the row's duration
    (``cfm.py:133-146``, ``utils_infer.py:443``); under bucketing, the GRN's
    global-over-positions norm and the depthwise conv taps would otherwise see
    the pad — masking them reproduces the reference's batch-1 output exactly
    for every row (and makes rows bucket-size invariant). ``None`` keeps the
    reference's *training* semantics (padded batch, no mask — ``cfm.py:277``).
    """
    p = params["text_embed"]
    b, nt = text.shape
    ids = text[:, :seq_len] + 1
    if nt < seq_len:
        ids = jnp.pad(ids, ((0, 0), (0, seq_len - nt)))
    ids = jnp.where(drop_text[:, None], 0, ids)
    h = m.embedding(p["embed"], ids)

    if p["blocks"] is not None:
        table = jnp.asarray(precompute_freqs_cis(cfg.text_dim, cfg.max_pos))
        h = h + table[:seq_len][None].astype(h.dtype)
        h = _scan_blocks(p["blocks"], h, m.convnext_v2_block, valid_mask)
    return h


def _scan_blocks(stacked, x, block_fn, mask=None):
    def body(carry, blk):
        return block_fn(blk, carry, mask=mask), None

    y, _ = lax.scan(body, x, stacked)
    return y


def input_embed(params, x, cond, text_emb, drop_audio_cond, mask=None, conv_pos_impl: str = "xla"):
    """``dit.py:81-87`` with per-sample audio-cond drop."""
    p = params["input_embed"]
    cond = jnp.where(drop_audio_cond[:, None, None], 0.0, cond)
    h = m.linear(p["proj"], jnp.concatenate([x, cond, text_emb], axis=-1))
    return m.conv_pos_embedding(p["conv_pos"], h, mask, impl=conv_pos_impl) + h


def dit_embed(params, cfg: DiTConfig, text: jnp.ndarray, seq_len: int, drop_text: jnp.ndarray,
              valid_mask: jnp.ndarray | None = None):
    """Step-invariant text embedding, lifted out of the ODE loop by the sampler."""
    return text_embed(params, cfg, text, seq_len, drop_text, valid_mask)


def dit_forward(
    params,
    cfg: DiTConfig,
    x: jnp.ndarray,  # (b, n, mel_dim) noised input
    cond: jnp.ndarray,  # (b, n, mel_dim) masked cond audio
    text: jnp.ndarray | None,  # (b, nt) int ids, pad -1 (None if text_emb given)
    time: jnp.ndarray,  # (b,) or scalar
    drop_audio_cond: jnp.ndarray,  # (b,) bool
    drop_text: jnp.ndarray,  # (b,) bool
    mask: jnp.ndarray | None = None,  # (b, n) bool
    text_emb: jnp.ndarray | None = None,  # precomputed text embedding
    compute_dtype=jnp.float32,
    dropout_rng: jax.Array | None = None,  # train-time: enables cfg.dropout
) -> jnp.ndarray:
    b, n, _ = x.shape
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (b,))

    t = m.timestep_embedding(params["time_embed"], time.astype(compute_dtype))
    if text_emb is None:
        text_emb = dit_embed(params, cfg, text, n, drop_text, valid_mask=mask)
    x = x.astype(compute_dtype)
    cond = cond.astype(compute_dtype)
    text_emb = text_emb.astype(compute_dtype)
    h = input_embed(params, x, cond, text_emb, drop_audio_cond, mask, conv_pos_impl=cfg.conv_pos_impl)

    freqs = jnp.asarray(rotary_freqs(n, cfg.dim_head))

    if cfg.long_skip_connection:
        residual = h

    # remat each scanned block: under grad, activations are recomputed instead
    # of stored — O(1) block activations in HBM, which is what lets one v5e
    # train at the reference's 38400-frame batch (trainer.py:305). Free at
    # inference (no residuals are saved when nothing differentiates).
    if dropout_rng is not None and cfg.dropout > 0.0:
        block_rngs = jax.random.split(dropout_rng, cfg.depth * 2).reshape(cfg.depth, 2, -1)

        @jax.checkpoint
        def body(carry, xs):
            blk, rngs = xs
            out = m.dit_block(
                blk, carry, t, cfg.heads, freqs, mask, impl=cfg.attn_impl,
                rope_all_heads=cfg.rope_all_heads, dropout_rngs=rngs, dropout_rate=cfg.dropout,
            )
            return out, None

        h, _ = lax.scan(body, h, (params["blocks"], block_rngs))
    else:

        @jax.checkpoint
        def body(carry, blk):
            out = m.dit_block(
                blk, carry, t, cfg.heads, freqs, mask, impl=cfg.attn_impl, rope_all_heads=cfg.rope_all_heads
            )
            return out, None

        h, _ = lax.scan(body, h, params["blocks"])

    if cfg.long_skip_connection:
        h = m.linear(params["long_skip"], jnp.concatenate([h, residual], axis=-1))

    h = m.adaln_zero_final(params["norm_out"], h, t)
    return m.linear(params["proj_out"], h)


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def quantize_dit_params(params):
    """Int8-quantize the hot matmuls (QKV/out + FF in/out across all blocks —
    ~2/3 of sampler FLOPs); embeddings, convs, AdaLN and output proj stay fp.
    Serving-only (quantized leaves are not differentiable)."""
    blocks = params["blocks"]
    q_blocks = {
        **blocks,
        "attn": {name: jax.vmap(m.quantize_linear_params)(blocks["attn"][name]) for name in ("to_q", "to_k", "to_v", "to_out")},
        "ff": {name: jax.vmap(m.quantize_linear_params)(blocks["ff"][name]) for name in ("in", "out")},
    }
    return {**params, "blocks": q_blocks}
