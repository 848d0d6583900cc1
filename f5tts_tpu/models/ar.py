"""Autoregressive TTS decoder branch (the non-flow path).

The reference's deployment configs name ``ai4bharat/indic-parler-tts`` (an
AR-decoder TTS) as an alternative TTS component (``dhwani_config.json:81``,
``README.md:6``) without vendoring any of its code; BASELINE config #3
exercises this branch. This module is a native AR mel-decoder built TPU-first:

- decoder-only transformer over ``[text tokens ; mel-frame embeddings]`` with
  causal attention,
- training: teacher-forced next-frame regression (L1+L2) + stop-flag BCE,
- generation: ``lax.scan`` incremental decode with a static-shape KV cache
  (cache in/out per step — XLA keeps it on-device), batch-friendly.

It shares the text tokenizer and the Vocos vocoder with the flow branch.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from f5tts_tpu.models import modules as m
from f5tts_tpu.ops.rope import apply_rotary_per_head, rotary_freqs


@dataclass(frozen=True)
class ARConfig:
    dim: int = 512
    depth: int = 12
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    mel_dim: int = 100
    text_num_embeds: int = 256
    max_text_len: int = 512
    max_mel_len: int = 2048

    @property
    def inner(self) -> int:
        return self.heads * self.dim_head


def init_ar(key: jax.Array, cfg: ARConfig):
    ks = jax.random.split(key, 8)

    def block(k):
        kk = jax.random.split(k, 3)
        return {
            "attn_norm": {"g": jnp.ones((cfg.dim,))},
            "attn": m.init_attention(kk[0], cfg.dim, cfg.heads, cfg.dim_head),
            "ff_norm": {"g": jnp.ones((cfg.dim,))},
            "ff": m.init_feed_forward(kk[1], cfg.dim, cfg.ff_mult),
        }

    from f5tts_tpu.models.dit import _stack

    return {
        "text_embed": m.init_embedding(ks[0], cfg.text_num_embeds + 1, cfg.dim),
        "mel_in": m.init_linear(ks[1], cfg.mel_dim, cfg.dim),
        "bos": jax.random.normal(ks[2], (cfg.dim,)) * 0.02,
        "blocks": _stack([block(k) for k in jax.random.split(ks[3], cfg.depth)]),
        "norm_out": {"g": jnp.ones((cfg.dim,))},
        "mel_out": m.init_linear(ks[4], cfg.dim, cfg.mel_dim),
        "stop_out": m.init_linear(ks[5], cfg.dim, 1),
    }


def _causal_attn(p, x, heads, freqs, valid_mask=None):
    b, n, _ = x.shape
    q = m.linear(p["to_q"], x)
    k = m.linear(p["to_k"], x)
    v = m.linear(p["to_v"], x)

    def split(t):
        return t.reshape(b, n, heads, -1).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    q = apply_rotary_per_head(q, freqs)
    k = apply_rotary_per_head(k, freqs)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (q.shape[-1] ** -0.5)
    causal = jnp.tril(jnp.ones((n, n), bool))
    mask = causal[None, None]
    if valid_mask is not None:
        mask = mask & valid_mask[:, None, None, :]
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return m.linear(p["to_out"], o.transpose(0, 2, 1, 3).reshape(b, n, -1))


def _block_apply(blk, x, heads, freqs, valid_mask=None):
    x = x + _causal_attn(blk["attn"], m.rms_norm(blk["attn_norm"], x), heads, freqs, valid_mask)
    return x + m.feed_forward(blk["ff"], m.rms_norm(blk["ff_norm"], x))


def _embed_sequence(params, cfg: ARConfig, text, mel):
    """[text emb ; BOS ; mel emb] -> (b, nt+1+nm, dim)."""
    te = m.embedding(params["text_embed"], text + 1)
    me = m.linear(params["mel_in"], mel)
    bos = jnp.broadcast_to(params["bos"], (mel.shape[0], 1, cfg.dim)).astype(me.dtype)
    return jnp.concatenate([te, bos, me], axis=1)


def ar_loss(params, cfg: ARConfig, text, mel, mel_lens, compute_dtype=jnp.float32):
    """Teacher-forced next-frame loss over valid frames + stop BCE."""
    b, nm, _ = mel.shape
    nt = text.shape[1]
    h = _embed_sequence(params, cfg, text, mel.astype(compute_dtype))
    n = h.shape[1]
    freqs = jnp.asarray(rotary_freqs(n, cfg.dim_head))
    text_valid = text != -1
    frame_pos = jnp.arange(nm)[None, :]
    mel_valid = frame_pos < mel_lens[:, None]
    valid = jnp.concatenate([text_valid, jnp.ones((b, 1), bool), mel_valid], axis=1)

    def body(carry, blk):
        return _block_apply(blk, carry, cfg.heads, freqs, valid), None

    h, _ = lax.scan(body, h, params["blocks"])
    h = m.rms_norm(params["norm_out"], h)

    # positions nt-1+k predict frame k: take outputs at [nt, nt+nm) shifted by BOS
    dec = h[:, nt : nt + nm]
    pred = m.linear(params["mel_out"], dec)
    stop_logit = m.linear(params["stop_out"], dec)[..., 0]

    tgt = mel.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    w = mel_valid.astype(jnp.float32)[..., None]
    l1 = jnp.sum(jnp.abs(pred - tgt) * w) / (jnp.maximum(w.sum(), 1.0) * cfg.mel_dim)
    l2 = jnp.sum(jnp.square(pred - tgt) * w) / (jnp.maximum(w.sum(), 1.0) * cfg.mel_dim)

    stop_tgt = (frame_pos == (mel_lens[:, None] - 1)).astype(jnp.float32)
    stop_w = mel_valid.astype(jnp.float32)
    bce = jnp.sum(
        stop_w * (jnp.maximum(stop_logit, 0) - stop_logit * stop_tgt + jnp.log1p(jnp.exp(-jnp.abs(stop_logit))))
    ) / jnp.maximum(stop_w.sum(), 1.0)
    return l1 + l2 + bce, {"l1": l1, "l2": l2, "stop_bce": bce}


# ---------------------------------------------------------------------------
# incremental generation with KV cache
# ---------------------------------------------------------------------------


def _init_cache(cfg: ARConfig, b: int, max_len: int, dtype):
    return {
        "k": jnp.zeros((cfg.depth, b, cfg.heads, max_len, cfg.dim_head), dtype),
        "v": jnp.zeros((cfg.depth, b, cfg.heads, max_len, cfg.dim_head), dtype),
    }


def _step_token(params, cfg: ARConfig, h_tok, cache, pos, freqs_full, key_valid):
    """One-token decode through all blocks; returns (h, new cache).

    ``key_valid``: (b, total) bool — keeps padded text keys masked during
    incremental steps, matching the prefill mask.
    """

    def per_block(carry, inp):
        # the full (depth, b, h, total, d) cache rides the CARRY and is
        # updated in place with a layer-indexed dynamic_update_slice —
        # threading per-layer caches through xs/ys re-stacks (re-writes) the
        # whole cache every decode step (measured 2.5x decode cost on the
        # Parler branch, same structure — see models/parler.py step_token)
        h_tok, ck, cv = carry
        blk, li = inp
        x = m.rms_norm(blk["attn_norm"], h_tok)
        b = x.shape[0]
        q = m.linear(blk["attn"]["to_q"], x).reshape(b, 1, cfg.heads, -1).transpose(0, 2, 1, 3)
        k_new = m.linear(blk["attn"]["to_k"], x).reshape(b, 1, cfg.heads, -1).transpose(0, 2, 1, 3)
        v_new = m.linear(blk["attn"]["to_v"], x).reshape(b, 1, cfg.heads, -1).transpose(0, 2, 1, 3)
        rope = lax.dynamic_slice_in_dim(freqs_full, pos, 1, axis=0)
        q = apply_rotary_per_head(q, rope)
        k_new = apply_rotary_per_head(k_new, rope)
        ck = lax.dynamic_update_slice(ck, k_new[None], (li, 0, 0, pos, 0))
        cv = lax.dynamic_update_slice(cv, v_new[None], (li, 0, 0, pos, 0))
        kc = lax.dynamic_index_in_dim(ck, li, 0, keepdims=False)
        vc = lax.dynamic_index_in_dim(cv, li, 0, keepdims=False)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, kc, preferred_element_type=jnp.float32) * (cfg.dim_head**-0.5)
        key_idx = jnp.arange(kc.shape[2])[None, None, None, :]
        allowed = (key_idx <= pos) & key_valid[:, None, None, :]
        logits = jnp.where(allowed, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(vc.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, vc).transpose(0, 2, 1, 3).reshape(b, 1, -1)
        h_tok = h_tok + m.linear(blk["attn"]["to_out"], o)
        h_tok = h_tok + m.feed_forward(blk["ff"], m.rms_norm(blk["ff_norm"], h_tok))
        return (h_tok, ck, cv), None

    n_layers = cache["k"].shape[0]
    (h_tok, new_k, new_v), _ = lax.scan(
        per_block, (h_tok, cache["k"], cache["v"]),
        (params["blocks"], jnp.arange(n_layers)))
    return h_tok, {"k": new_k, "v": new_v}


def ar_generate(
    params,
    cfg: ARConfig,
    text: jnp.ndarray,  # (b, nt) pad -1
    max_frames: int,
    compute_dtype=jnp.float32,
    stop_threshold: float = 0.5,
):
    """Greedy AR mel generation. Returns (mel (b, max_frames, mel_dim),
    lengths (b,)). Static shapes; stop tracked via a per-row done flag."""
    b, nt = text.shape
    total = nt + 1 + max_frames
    freqs_full = jnp.asarray(rotary_freqs(total, cfg.dim_head)).astype(compute_dtype)

    # prefill: run the text prompt + BOS through the non-incremental path once
    te = m.embedding(params["text_embed"], text + 1).astype(compute_dtype)
    bos = jnp.broadcast_to(params["bos"], (b, 1, cfg.dim)).astype(compute_dtype)
    prompt = jnp.concatenate([te, bos], axis=1)  # (b, nt+1, dim)
    text_valid = jnp.concatenate([text != -1, jnp.ones((b, 1), bool)], axis=1)

    cache = _init_cache(cfg, b, total, compute_dtype)

    # prefill fills the cache via the full causal pass
    freqs_prompt = freqs_full[: nt + 1]

    def prefill_block(carry, blk):
        h, layer = carry
        bq = h.shape[0]
        x = m.rms_norm(blk["attn_norm"], h)

        def split(t):
            return t.reshape(bq, nt + 1, cfg.heads, -1).transpose(0, 2, 1, 3)

        q = apply_rotary_per_head(split(m.linear(blk["attn"]["to_q"], x)), freqs_prompt)
        k = apply_rotary_per_head(split(m.linear(blk["attn"]["to_k"], x)), freqs_prompt)
        v = split(m.linear(blk["attn"]["to_v"], x))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (cfg.dim_head**-0.5)
        causal = jnp.tril(jnp.ones((nt + 1, nt + 1), bool))[None, None]
        mask = causal & text_valid[:, None, None, :]
        logits = jnp.where(mask, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(bq, nt + 1, -1)
        h = h + m.linear(blk["attn"]["to_out"], o)
        h = h + m.feed_forward(blk["ff"], m.rms_norm(blk["ff_norm"], h))
        return (h, layer + 1), (k, v)

    (h_prompt, _), (pk, pv) = lax.scan(prefill_block, (prompt, 0), params["blocks"])
    key_valid = jnp.concatenate([text_valid, jnp.ones((b, max_frames), bool)], axis=1)
    cache["k"] = lax.dynamic_update_slice_in_dim(cache["k"], pk, 0, axis=3)
    cache["v"] = lax.dynamic_update_slice_in_dim(cache["v"], pv, 0, axis=3)

    h_last = m.rms_norm(params["norm_out"], h_prompt[:, -1:])
    first_frame = m.linear(params["mel_out"], h_last)  # (b, 1, mel)

    def step(carry, i):
        frame, cache, done, pending_stop, length = carry
        out_frame = jnp.where(done[:, None, None], 0.0, frame)
        length = jnp.where(done, length, i + 1)

        h_tok = m.linear(params["mel_in"], frame.astype(compute_dtype))
        pos = nt + 1 + i
        h_tok, cache = _step_token(params, cfg, h_tok, cache, pos, freqs_full, key_valid)
        h_out = m.rms_norm(params["norm_out"], h_tok)
        next_frame = m.linear(params["mel_out"], h_out)
        stop = jax.nn.sigmoid(m.linear(params["stop_out"], h_out)[..., 0])[:, 0]

        # stop computed here refers to the *next* frame being the last one:
        # it takes effect one step after that frame is emitted
        done = done | pending_stop
        pending_stop = stop > stop_threshold
        return (next_frame, cache, done, pending_stop, length), out_frame[:, 0]

    done0 = jnp.zeros((b,), bool)
    pend0 = jnp.zeros((b,), bool)
    len0 = jnp.zeros((b,), jnp.int32)
    (_, _, done, _, lengths), frames = lax.scan(
        step, (first_frame, cache, done0, pend0, len0), jnp.arange(max_frames)
    )
    mel = frames.transpose(1, 0, 2)  # (b, max_frames, mel)
    return mel, lengths
