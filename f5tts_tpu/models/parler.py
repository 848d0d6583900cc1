"""Parler-TTS-compatible autoregressive branch (BASELINE config #3).

The reference names ``ai4bharat/indic-parler-tts`` as its alternative (non
flow-matching) TTS component without vendoring any code for it
(``dhwani_config.json:81``, ``README.md:6,96``). Indic Parler-TTS is the
ParlerTTS architecture: a frozen FLAN-T5 *description* encoder conditions a
MusicGen-style decoder over DAC codec tokens (9 codebooks, delay pattern);
the transcript *prompt* is embedded with a dedicated embedding table and
prepended to the decoder sequence (``prompt_cross_attention=False`` in the
mini/v1 configs this checkpoint derives from).

This module implements that architecture natively in JAX, TPU-first:

- ``t5_encode``            — T5 encoder (relative-position-bias attention,
                             gated-GELU FF, RMS layer norm), ``lax.scan``
                             over stacked blocks.
- ``parler_decoder_forward`` — teacher-forced decoder pass (training /
                             goldens): summed per-codebook embeddings +
                             sinusoidal positions, causal self-attention,
                             cross-attention to the encoder, per-codebook LM
                             heads.
- ``parler_generate``      — static-shape ``lax.scan`` incremental decode
                             with a KV cache, per-codebook temperature/top-k
                             sampling, and the MusicGen *delay pattern*
                             applied in-loop (codebook k trails codebook 0 by
                             k positions).
- ``build_delay_pattern`` / ``revert_delay_pattern`` — the pattern-mask
                             contract of HF ``build_delay_pattern_mask``.
- ``dac_decode_codes``     — DAC codec decoder (RVQ ``from_codes`` + snake /
                             transposed-conv stack) for codes → waveform.
- ``convert_t5_encoder`` / ``convert_parler_decoder`` / ``convert_dac`` —
                             torch→JAX weight converters over HF state-dict
                             layouts (T5EncoderModel, ParlerTTS/Musicgen
                             decoder, DacModel; weight-norm parametrizations
                             folded).

Numerics are golden-tested against the torch implementations that ship in
``transformers`` (T5EncoderModel / MusicgenForCausalLM / DacModel) with
random weights — the real checkpoint is not fetchable in this environment,
but the converters accept its exact state-dict naming.

All sequence work is static-shape (padding masks, fixed frame budgets) so
XLA compiles one program per (batch, frames) bucket, same as the flow branch.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from f5tts_tpu.models import modules as m

# ---------------------------------------------------------------------------
# T5 encoder
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class T5Config:
    """flan-t5 geometry (indic-parler-tts uses flan-t5-large: d_model 1024,
    d_kv 64, d_ff 2816, 16 heads, 24 layers, vocab 32128)."""

    vocab: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    heads: int = 16
    layers: int = 24
    rel_buckets: int = 32
    rel_max_dist: int = 128
    ln_eps: float = 1e-6

    @property
    def inner(self) -> int:
        return self.heads * self.d_kv


def _t5_rms(g, x, eps):
    """T5LayerNorm: no mean subtraction, fp32 variance, scale only."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (g.astype(jnp.float32) * x32 * lax.rsqrt(var + eps)).astype(x.dtype)


def _nobias(key, d_in, d_out):
    # T5/MusicGen checkpoints carry their own scaling; init only matters for
    # from-scratch training — match torch's default kaiming-uniform bound.
    bound = 1.0 / math.sqrt(d_in)
    return {"w": jax.random.uniform(key, (d_in, d_out), jnp.float32, -bound, bound)}


def init_t5_encoder(key: jax.Array, cfg: T5Config):
    ks = jax.random.split(key, 4)

    def block(k):
        kk = jax.random.split(k, 8)
        return {
            "ln1": {"g": jnp.ones((cfg.d_model,))},
            "q": _nobias(kk[0], cfg.d_model, cfg.inner),
            "k": _nobias(kk[1], cfg.d_model, cfg.inner),
            "v": _nobias(kk[2], cfg.d_model, cfg.inner),
            "o": _nobias(kk[3], cfg.inner, cfg.d_model),
            "ln2": {"g": jnp.ones((cfg.d_model,))},
            "wi_0": _nobias(kk[4], cfg.d_model, cfg.d_ff),
            "wi_1": _nobias(kk[5], cfg.d_model, cfg.d_ff),
            "wo": _nobias(kk[6], cfg.d_ff, cfg.d_model),
        }

    from f5tts_tpu.models.dit import _stack

    return {
        "embed": jax.random.normal(ks[0], (cfg.vocab, cfg.d_model)) * 1.0,
        "rel_bias": jax.random.normal(ks[1], (cfg.rel_buckets, cfg.heads)) * 0.02,
        "blocks": _stack([block(k) for k in jax.random.split(ks[2], cfg.layers)]),
        "final_ln": {"g": jnp.ones((cfg.d_model,))},
    }


def _rel_bucket(rel, num_buckets: int, max_dist: int):
    """Bidirectional relative-position bucketing (T5Attention semantics)."""
    nb = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * nb
    rel = jnp.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    # clamp the log argument away from zero; the value is unused when is_small
    rel_f = jnp.maximum(rel.astype(jnp.float32), 1.0)
    large = max_exact + (
        jnp.log(rel_f / max_exact) / math.log(max_dist / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return buckets + jnp.where(is_small, rel, large)


def t5_relative_bias(rel_bias, n: int, cfg: T5Config):
    """(1, heads, n, n) additive attention bias from the bucket table."""
    pos = jnp.arange(n)
    rel = pos[None, :] - pos[:, None]  # memory - query
    bucket = _rel_bucket(rel, cfg.rel_buckets, cfg.rel_max_dist)
    return rel_bias[bucket].transpose(2, 0, 1)[None]


def t5_encode(params, cfg: T5Config, ids: jnp.ndarray, mask: jnp.ndarray | None = None,
              compute_dtype=jnp.float32):
    """ids (b, n) int32, mask (b, n) bool (True = valid) -> (b, n, d_model).

    Matches transformers T5EncoderModel: unscaled attention (the 1/sqrt(d) is
    folded into the trained weights), shared relative bias from layer 0,
    gated gelu_new FF, pre-RMS norms, fp32 softmax.
    """
    b, n = ids.shape
    h = params["embed"][ids].astype(compute_dtype)
    bias = t5_relative_bias(params["rel_bias"].astype(jnp.float32), n, cfg)
    if mask is not None:
        bias = bias + jnp.where(mask, 0.0, -1e9)[:, None, None, :]

    def attn(blk, x):
        q = m.linear(blk["q"], x).reshape(b, n, cfg.heads, cfg.d_kv).transpose(0, 2, 1, 3)
        k = m.linear(blk["k"], x).reshape(b, n, cfg.heads, cfg.d_kv).transpose(0, 2, 1, 3)
        v = m.linear(blk["v"], x).reshape(b, n, cfg.heads, cfg.d_kv).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits + bias, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, n, -1)
        return m.linear(blk["o"], o)

    def ff(blk, x):
        gate = jax.nn.gelu(m.linear(blk["wi_0"], x), approximate=True)  # gelu_new
        return m.linear(blk["wo"], gate * m.linear(blk["wi_1"], x))

    def body(h, blk):
        h = h + attn(blk, _t5_rms(blk["ln1"]["g"], h, cfg.ln_eps))
        h = h + ff(blk, _t5_rms(blk["ln2"]["g"], h, cfg.ln_eps))
        return h, None

    h, _ = lax.scan(body, h, params["blocks"])
    return _t5_rms(params["final_ln"]["g"], h, cfg.ln_eps)


# ---------------------------------------------------------------------------
# Parler / MusicGen codebook decoder
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ParlerDecoderConfig:
    """indic-parler-tts decoder geometry: hidden 1024, 24 layers, 16 heads,
    ffn 4096, 9 codebooks, codebook vocab 1088 (+1 pad slot in the embedding),
    prompt vocab = the T5 tokenizer (32128)."""

    vocab: int = 1088
    codebooks: int = 9
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    ffn: int = 4096
    cross_dim: int = 1024
    prompt_vocab: int = 32128
    ln_eps: float = 1e-5
    # grouped-query attention (parler-tts v1.1 configs expose
    # num_key_value_heads / num_cross_attention_key_value_heads; llama-style
    # repeat_kv). None = full MHA (MusicGen / v1 behavior, torch-goldened).
    kv_heads: int | None = None
    cross_kv_heads: int | None = None
    # decode-step layer walk: "stacked" = lax.scan over stacked block params
    # with a layer-indexed cache gather/update (compact HLO); "unrolled" =
    # python loop over layers with PER-LAYER cache arrays in the scan carry —
    # no dynamic layer gather, static per-layer slices (the probe
    # scripts/parler_step_probe.py measures which wins on chip; the gather
    # can materialize a full per-layer cache copy per step)
    decode_layout: str = "stacked"
    # unrolled-layout option: one (hidden -> q|k|v) matmul per decode step
    # instead of three GEMV-shaped launches. Decode is bandwidth/launch-bound
    # (PARLER_STEP_PROBE.json: fused variant -22% vs unrolled) — the OPPOSITE
    # regime from the DiT serving path where qkv fusion measured slower
    # (BENCH.md round-2; large-batch MXU-bound). ca_q is NOT fused: it
    # applies to the post-self-attention norm, so fusing it would change the
    # math.
    fuse_decode_qkv: bool = False
    # decode-step cache attention: "xla" = einsum + softmax (portable);
    # "pallas" = fused single-pass kernel (ops/pallas/decode_attention.py) —
    # reads each cache exactly once per step instead of XLA's ~3x traffic
    # (layout copies + materialized f32 logits). Requires
    # decode_layout="unrolled"; the cache allocation is rounded up to a
    # 16-position multiple (sublane tile) and the tail masked.
    decode_attn: str = "xla"

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def n_kv(self) -> int:
        return self.kv_heads or self.heads

    @property
    def n_cross_kv(self) -> int:
        return self.cross_kv_heads or self.heads


def init_parler_decoder(key: jax.Array, cfg: ParlerDecoderConfig):
    ks = jax.random.split(key, 6)

    def ln():
        return {"w": jnp.ones((cfg.hidden,)), "b": jnp.zeros((cfg.hidden,))}

    kv_w = cfg.n_kv * cfg.head_dim
    ckv_w = cfg.n_cross_kv * cfg.head_dim

    def block(k):
        kk = jax.random.split(k, 10)
        return {
            "ln_sa": ln(),
            "sa": {
                "q": _nobias(kk[0], cfg.hidden, cfg.hidden),
                "k": _nobias(kk[1], cfg.hidden, kv_w),
                "v": _nobias(kk[2], cfg.hidden, kv_w),
                "o": _nobias(kk[3], cfg.hidden, cfg.hidden),
            },
            "ln_ca": ln(),
            "ca": {
                "q": _nobias(kk[4], cfg.hidden, cfg.hidden),
                "k": _nobias(kk[5], cfg.hidden, ckv_w),
                "v": _nobias(kk[6], cfg.hidden, ckv_w),
                "o": _nobias(kk[7], cfg.hidden, cfg.hidden),
            },
            "ln_ff": ln(),
            "fc1": _nobias(kk[8], cfg.hidden, cfg.ffn),
            "fc2": _nobias(kk[9], cfg.ffn, cfg.hidden),
        }

    from f5tts_tpu.models.dit import _stack

    p = {
        "embed_tokens": jax.random.normal(ks[0], (cfg.codebooks, cfg.vocab + 1, cfg.hidden)) * 0.02,
        "embed_prompts": jax.random.normal(ks[1], (cfg.prompt_vocab, cfg.hidden)) * 0.02,
        "blocks": _stack([block(k) for k in jax.random.split(ks[2], cfg.layers)]),
        "final_ln": {"w": jnp.ones((cfg.hidden,)), "b": jnp.zeros((cfg.hidden,))},
        "lm_heads": jax.random.normal(ks[3], (cfg.codebooks, cfg.hidden, cfg.vocab)) * 0.02,
    }
    if cfg.cross_dim != cfg.hidden:
        p["enc_proj"] = m.init_linear(ks[4], cfg.cross_dim, cfg.hidden)
    return p


def sinusoidal_positions(positions: jnp.ndarray, dim: int) -> jnp.ndarray:
    """MusicGen sinusoidal table: ``cat([cos, sin], dim=1)`` over half-dim
    frequencies (cos first — tensor2tensor layout, not AIAYN)."""
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
    ang = positions.astype(jnp.float32)[:, None] * freq[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1)


def _split_heads(t, b, n, heads):
    return t.reshape(b, n, heads, -1).transpose(0, 2, 1, 3)


def _kv_count(p, head_dim: int) -> int:
    """KV head count inferred from the projection width (GQA-aware)."""
    return p["k"]["w"].shape[1] // head_dim


def _expand_kv(t, heads: int):
    """(b, kvh, n, d) -> (b, heads, n, d) llama-style repeat_kv."""
    kvh = t.shape[1]
    if kvh == heads:
        return t
    return jnp.repeat(t, heads // kvh, axis=1)


def _mha(p, x, kv, heads, bias=None):
    """Generic M(Q/G)A: q from x, k/v from kv (possibly fewer KV heads),
    additive bias (b,1,nq,nk) or None."""
    b, nq, _ = x.shape
    nk = kv.shape[1]
    head_dim = x.shape[-1] // heads
    scale = head_dim**-0.5
    nkv = _kv_count(p, head_dim)
    q = _split_heads(m.linear(p["q"], x) * scale, b, nq, heads)
    k = _expand_kv(_split_heads(m.linear(p["k"], kv), b, nk, nkv), heads)
    v = _expand_kv(_split_heads(m.linear(p["v"], kv), b, nk, nkv), heads)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, nq, -1)
    return m.linear(p["o"], o)


def _embed_codes(params, codes):
    """codes (b, K, n) -> summed embeddings (b, n, hidden)."""
    K = codes.shape[1]
    emb = params["embed_tokens"][jnp.arange(K)[None, :, None], codes]  # (b,K,n,h)
    return jnp.sum(emb, axis=1)


def _encoder_states(params, enc, compute_dtype):
    enc = enc.astype(compute_dtype)
    if "enc_proj" in params:
        enc = m.linear(params["enc_proj"], enc)
    return enc


def parler_decoder_forward(
    params,
    cfg: ParlerDecoderConfig,
    codes: jnp.ndarray,  # (b, K, n) int32 in [0, vocab] (vocab = pad/bos slot)
    enc: jnp.ndarray,  # (b, m, cross_dim) encoder hidden states
    enc_mask: jnp.ndarray | None = None,  # (b, m) bool
    prompt_ids: jnp.ndarray | None = None,  # (b, p) transcript tokens
    prompt_mask: jnp.ndarray | None = None,  # (b, p) bool
    compute_dtype=jnp.float32,
):
    """Teacher-forced pass. Returns per-codebook logits (b, K, n, vocab) for
    the code positions (prompt positions are dropped from the head outputs,
    as in ParlerTTS where ``prompt_hidden_states`` are prepended)."""
    b, K, n = codes.shape
    x = _embed_codes(params, codes).astype(compute_dtype)
    p = 0
    if prompt_ids is not None:
        p = prompt_ids.shape[1]
        pe = params["embed_prompts"][jnp.maximum(prompt_ids, 0)].astype(compute_dtype)
        if prompt_mask is not None:
            pe = jnp.where(prompt_mask[..., None], pe, 0.0)
        x = jnp.concatenate([pe, x], axis=1)
    total = p + n
    pos = sinusoidal_positions(jnp.arange(total), cfg.hidden).astype(compute_dtype)
    h = x + pos[None]

    causal = jnp.tril(jnp.ones((total, total), bool))[None, None]
    if prompt_mask is not None and p:
        key_valid = jnp.concatenate([prompt_mask, jnp.ones((b, n), bool)], axis=1)
        causal = causal & key_valid[:, None, None, :]
    sa_bias = jnp.where(causal, 0.0, -1e9)
    ca_bias = None
    if enc_mask is not None:
        ca_bias = jnp.where(enc_mask, 0.0, -1e9)[:, None, None, :]
    enc_h = _encoder_states(params, enc, compute_dtype)

    def body_fixed(h, blk):
        xn = m.layer_norm(h, cfg.ln_eps, blk["ln_sa"]["w"], blk["ln_sa"]["b"])
        h = h + _mha(blk["sa"], xn, xn, cfg.heads, sa_bias)
        xn = m.layer_norm(h, cfg.ln_eps, blk["ln_ca"]["w"], blk["ln_ca"]["b"])
        h = h + _mha(blk["ca"], xn, enc_h, cfg.heads, ca_bias)
        y = m.layer_norm(h, cfg.ln_eps, blk["ln_ff"]["w"], blk["ln_ff"]["b"])
        h = h + m.linear(blk["fc2"], jax.nn.gelu(m.linear(blk["fc1"], y), approximate=False))
        return h, None

    h, _ = lax.scan(body_fixed, h, params["blocks"])
    h = m.layer_norm(h, cfg.ln_eps, params["final_ln"]["w"], params["final_ln"]["b"])
    h = h[:, p:]
    logits = jnp.einsum("bnh,khv->bknv", h.astype(jnp.float32),
                        params["lm_heads"].astype(jnp.float32))
    return logits


def parler_loss(params, cfg: ParlerDecoderConfig, codes, code_mask, enc, enc_mask=None,
                prompt_ids=None, prompt_mask=None, pad_token: int | None = None,
                compute_dtype=jnp.float32):
    """Teacher-forced next-token cross-entropy, averaged over valid positions
    and codebooks. ``codes`` already carries the delay pattern (pad-filled);
    positions where ``code_mask`` is False (or the target is the pad slot)
    are excluded — HF trains with those labels set to -100. ``pad_token``
    defaults to the extra pad/bos embedding slot ``cfg.vocab`` (the value
    ``build_delay_pattern`` fills with); pass another id to override, or a
    negative value to disable pad exclusion."""
    inp = codes[..., :-1]
    tgt = codes[..., 1:]
    logits = parler_decoder_forward(params, cfg, inp, enc, enc_mask, prompt_ids,
                                    prompt_mask, compute_dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.minimum(tgt, cfg.vocab - 1)[..., None], axis=-1)[..., 0]
    w = code_mask[..., 1:].astype(jnp.float32)
    pad = cfg.vocab if pad_token is None else pad_token
    if pad >= 0:
        # without this, pad targets clamp to real token vocab-1 and get trained
        w = w * (tgt != pad)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


# --- delay pattern -----------------------------------------------------------


def build_delay_pattern(codes: np.ndarray, pad_token: int, max_length: int) -> np.ndarray:
    """(b, K, n) -> (b, K, max_length) with codebook k shifted right by k and
    pad elsewhere — the HF ``build_delay_pattern_mask`` layout (mono)."""
    b, K, n = codes.shape
    out = np.full((b, K, max_length), pad_token, dtype=codes.dtype)
    for k in range(K):
        span = min(n, max_length - k)
        out[:, k, k : k + span] = codes[:, k, :span]
        # positions past the shifted stream stay pad (EOS padding region)
    return out


def revert_delay_pattern(delayed: jnp.ndarray, frames: int) -> jnp.ndarray:
    """(b, K, total) delayed -> (b, K, frames): codebook k read at offset k."""
    b, K, total = delayed.shape
    idx = jnp.arange(frames)[None, :] + jnp.arange(K)[:, None]  # (K, frames)
    return jnp.take_along_axis(delayed, jnp.broadcast_to(idx[None], (b, K, frames)), axis=2)


# --- incremental generation ---------------------------------------------------


def _init_cache(cfg: ParlerDecoderConfig, b: int, total: int, dtype):
    return {
        "k": jnp.zeros((cfg.layers, b, cfg.n_kv, total, cfg.head_dim), dtype),
        "v": jnp.zeros((cfg.layers, b, cfg.n_kv, total, cfg.head_dim), dtype),
    }


def _sample(key, logits, temperature: float, top_k: int):
    """logits (..., vocab) -> token ids. temperature<=0 → greedy."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        kth = lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    flat = logits.reshape(-1, logits.shape[-1])
    toks = jax.random.categorical(key, flat, axis=-1)
    return toks.reshape(logits.shape[:-1]).astype(jnp.int32)


def _sample_rows(keys, logits, temperature: float, top_k: int):
    """Per-row keys (b,) x logits (b, K, vocab) -> (b, K): each row's sampling
    stream depends only on its own key, never on batch size or co-batched
    rows (the continuous batcher mixes requests — same philosophy as the flow
    engine's per-row seeded noise, ``cfm.py:181-186`` parity)."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        kth = lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.vmap(
        lambda k, lg: jax.random.categorical(k, lg, axis=-1))(keys, logits).astype(jnp.int32)


def _decode_ctx(
    params,
    cfg: ParlerDecoderConfig,
    enc: jnp.ndarray,  # (b, m, cross_dim)
    enc_mask: jnp.ndarray | None,
    frames: int,
    key: jax.Array,
    prompt_ids: jnp.ndarray | None,
    prompt_mask: jnp.ndarray | None,
    bos_token: int | None,
    pad_token: int | None,
    eos_token: int,
    temperature: float,
    top_k: int,
    row_seeds: jnp.ndarray | None,
    compute_dtype,
):
    """Shared decode context: prefill + the per-position scan body.

    Returns ``(carry0, step, steps)`` where ``carry0 = (logits, cache, key,
    eos_frame)`` is the post-prefill state and ``step`` the scan body over
    code-stream positions — ``parler_generate`` scans all of ``1..steps`` at
    once, ``parler_decode_segment`` scans sub-ranges with the carry handed
    between calls (the streaming path)."""
    bos = cfg.vocab if bos_token is None else bos_token
    pad = bos if pad_token is None else pad_token
    b = enc.shape[0]
    K = cfg.codebooks
    p = 0 if prompt_ids is None else prompt_ids.shape[1]
    steps = frames + K - 1  # positions 1 .. frames+K-1 of the code stream
    total = p + 1 + steps
    if cfg.decode_attn == "pallas":
        # fused cache-attention kernel: cache positions ride the LANE axis
        # (128-wide tile) — round the allocation up; the causal step bound
        # masks the tail (never written, never attended)
        assert cfg.decode_layout == "unrolled", \
            "decode_attn='pallas' requires decode_layout='unrolled'"
        total = -(-total // 128) * 128

    enc_h = _encoder_states(params, enc, compute_dtype)
    ca_bias = None
    if enc_mask is not None:
        ca_bias = jnp.where(enc_mask, 0.0, -1e9)[:, None, None, :]

    # positions span the concatenated [prompt ; codes] sequence (ParlerTTS
    # prepends prompt_hidden_states before embed_positions)
    pos_table = sinusoidal_positions(jnp.arange(total), cfg.hidden).astype(compute_dtype)

    # ---- prefill: [prompt ; BOS] ------------------------------------------
    bos_row = jnp.full((b, K, 1), bos, jnp.int32)
    x0 = _embed_codes(params, bos_row).astype(compute_dtype)
    if p:
        pe = params["embed_prompts"][jnp.maximum(prompt_ids, 0)].astype(compute_dtype)
        if prompt_mask is not None:
            pe = jnp.where(prompt_mask[..., None], pe, 0.0)
        x0 = jnp.concatenate([pe, x0], axis=1)
    x0 = x0 + pos_table[None, : p + 1]
    n0 = x0.shape[1]

    key_valid = jnp.ones((b, total), bool)
    if p and prompt_mask is not None:
        key_valid = jnp.concatenate(
            [prompt_mask, jnp.ones((b, total - p), bool)], axis=1)

    causal0 = jnp.tril(jnp.ones((n0, n0), bool))[None, None] & key_valid[:, None, None, :n0]
    sa_bias0 = jnp.where(causal0, 0.0, -1e9)

    cache = _init_cache(cfg, b, total, compute_dtype)

    def prefill_block(h, blk):
        xn = m.layer_norm(h, cfg.ln_eps, blk["ln_sa"]["w"], blk["ln_sa"]["b"])
        scale = cfg.head_dim**-0.5
        q = _split_heads(m.linear(blk["sa"]["q"], xn) * scale, b, n0, cfg.heads)
        k = _split_heads(m.linear(blk["sa"]["k"], xn), b, n0, cfg.n_kv)
        v = _split_heads(m.linear(blk["sa"]["v"], xn), b, n0, cfg.n_kv)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, _expand_kv(k, cfg.heads),
            preferred_element_type=jnp.float32) + sa_bias0
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, _expand_kv(v, cfg.heads))
        o = o.transpose(0, 2, 1, 3).reshape(b, n0, -1)
        h = h + m.linear(blk["sa"]["o"], o)
        xn = m.layer_norm(h, cfg.ln_eps, blk["ln_ca"]["w"], blk["ln_ca"]["b"])
        h = h + _mha(blk["ca"], xn, enc_h, cfg.heads, ca_bias)
        y = m.layer_norm(h, cfg.ln_eps, blk["ln_ff"]["w"], blk["ln_ff"]["b"])
        h = h + m.linear(blk["fc2"], jax.nn.gelu(m.linear(blk["fc1"], y), approximate=False))
        return h, (k, v)

    h0, (pk, pv) = lax.scan(prefill_block, x0, params["blocks"])
    unrolled = cfg.decode_layout == "unrolled"
    if unrolled:
        # per-layer cache arrays (tuple carry): static layer slices in the
        # decode step — no dynamic layer gather over the stacked cache.
        # decode_attn="pallas" keeps the K cache TRANSPOSED (d, total) so
        # the kernel's logits land with positions on the lane axis.
        k_transposed = cfg.decode_attn == "pallas"

        def _layer_cache(part, l, transposed=False):
            if transposed:
                z = jnp.zeros((b, cfg.n_kv, cfg.head_dim, total), compute_dtype)
                return lax.dynamic_update_slice_in_dim(
                    z, part[l].transpose(0, 1, 3, 2), 0, axis=3)
            z = jnp.zeros((b, cfg.n_kv, total, cfg.head_dim), compute_dtype)
            return lax.dynamic_update_slice_in_dim(z, part[l], 0, axis=2)

        cache = tuple((_layer_cache(pk, l, k_transposed), _layer_cache(pv, l))
                      for l in range(cfg.layers))
    else:
        cache["k"] = lax.dynamic_update_slice_in_dim(cache["k"], pk, 0, axis=3)
        cache["v"] = lax.dynamic_update_slice_in_dim(cache["v"], pv, 0, axis=3)

    # cross-attn K/V are static per layer — precompute (expanded) outside the scan
    def ca_kv(blk):
        nk = enc_h.shape[1]
        k = _split_heads(m.linear(blk["ca"]["k"], enc_h), b, nk, cfg.n_cross_kv)
        v = _split_heads(m.linear(blk["ca"]["v"], enc_h), b, nk, cfg.n_cross_kv)
        return _expand_kv(k, cfg.heads), _expand_kv(v, cfg.heads)

    ca_k, ca_v = jax.vmap(ca_kv)(params["blocks"])

    hn = m.layer_norm(h0[:, -1:], cfg.ln_eps, params["final_ln"]["w"], params["final_ln"]["b"])
    logits0 = jnp.einsum("bnh,khv->bknv", hn.astype(jnp.float32),
                         params["lm_heads"].astype(jnp.float32))[:, :, 0]

    def step_token(h_tok, cache, step_pos):
        """one token (b,1,hidden) through all layers with cache at step_pos
        (absolute position p + step_pos in the cache).

        The full (layers, b, kv, total, d) cache rides the scan CARRY and is
        updated in place with a layer-indexed dynamic_update_slice — an
        earlier version threaded per-layer caches through the scan's xs/ys,
        which re-stacked (re-wrote) the entire cache every decode step:
        0.77 GB/step of avoidable HBM writes at the real geometry (batch 16,
        494 positions), measured as the dominant decode cost."""
        abs_pos = p + step_pos

        def per_block(carry, inp):
            h_tok, ck, cv = carry
            blk, cak, cav, li = inp
            xn = m.layer_norm(h_tok, cfg.ln_eps, blk["ln_sa"]["w"], blk["ln_sa"]["b"])
            scale = cfg.head_dim**-0.5
            q = _split_heads(m.linear(blk["sa"]["q"], xn) * scale, b, 1, cfg.heads)
            k_new = _split_heads(m.linear(blk["sa"]["k"], xn), b, 1, cfg.n_kv)
            v_new = _split_heads(m.linear(blk["sa"]["v"], xn), b, 1, cfg.n_kv)
            ck = lax.dynamic_update_slice(ck, k_new[None], (li, 0, 0, abs_pos, 0))
            cv = lax.dynamic_update_slice(cv, v_new[None], (li, 0, 0, abs_pos, 0))
            kc = lax.dynamic_index_in_dim(ck, li, 0, keepdims=False)
            vc = lax.dynamic_index_in_dim(cv, li, 0, keepdims=False)
            lg = jnp.einsum("bhqd,bhkd->bhqk", q, _expand_kv(kc, cfg.heads),
                            preferred_element_type=jnp.float32)
            allowed = (jnp.arange(total)[None, None, None, :] <= abs_pos) & key_valid[:, None, None, :]
            lg = jnp.where(allowed, lg, -1e9)
            pr = jax.nn.softmax(lg, axis=-1).astype(vc.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", pr, _expand_kv(vc, cfg.heads))
            o = o.transpose(0, 2, 1, 3).reshape(b, 1, -1)
            h_tok = h_tok + m.linear(blk["sa"]["o"], o)
            # cross-attention with precomputed K/V
            xn = m.layer_norm(h_tok, cfg.ln_eps, blk["ln_ca"]["w"], blk["ln_ca"]["b"])
            q = _split_heads(m.linear(blk["ca"]["q"], xn) * scale, b, 1, cfg.heads)
            lg = jnp.einsum("bhqd,bhkd->bhqk", q, cak, preferred_element_type=jnp.float32)
            if ca_bias is not None:
                lg = lg + ca_bias
            pr = jax.nn.softmax(lg, axis=-1).astype(cav.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", pr, cav).transpose(0, 2, 1, 3).reshape(b, 1, -1)
            h_tok = h_tok + m.linear(blk["ca"]["o"], o)
            y = m.layer_norm(h_tok, cfg.ln_eps, blk["ln_ff"]["w"], blk["ln_ff"]["b"])
            h_tok = h_tok + m.linear(blk["fc2"], jax.nn.gelu(m.linear(blk["fc1"], y), approximate=False))
            return (h_tok, ck, cv), None

        n_layers = ca_k.shape[0]
        (h_tok, nk, nv), _ = lax.scan(
            per_block, (h_tok, cache["k"], cache["v"]),
            (params["blocks"], ca_k, ca_v, jnp.arange(n_layers)))
        return h_tok, {"k": nk, "v": nv}

    # fused q|k|v weight per layer for the unrolled step (one bandwidth-bound
    # matmul instead of three; concat runs once per decode CALL, amortized
    # over all positions)
    wqkv_fused = None
    if unrolled and cfg.fuse_decode_qkv:
        wqkv_fused = jnp.concatenate(
            [params["blocks"]["sa"]["q"]["w"], params["blocks"]["sa"]["k"]["w"],
             params["blocks"]["sa"]["v"]["w"]], axis=-1).astype(compute_dtype)

    # cross-attention operands for the pallas decode kernel: K transposed to
    # (d, enc) and enc padded to the 128-lane tile, masked via the bias —
    # static per decode call, computed once outside the position scan
    ca_kt_pad = ca_v_pad = ca_bias_pad = None
    if unrolled and cfg.decode_attn == "pallas":
        enc_n = ca_k.shape[3]
        padn = -(-enc_n // 128) * 128 - enc_n
        ca_kt_pad = jnp.pad(
            ca_k, ((0, 0), (0, 0), (0, 0), (0, padn), (0, 0))).transpose(0, 1, 2, 4, 3)
        ca_v_pad = jnp.pad(ca_v, ((0, 0), (0, 0), (0, 0), (0, padn), (0, 0)))
        _cb = (jnp.where(enc_mask, 0.0, -1e9) if enc_mask is not None
               else jnp.zeros((b, enc_n)))
        ca_bias_pad = jnp.pad(_cb.astype(jnp.float32), ((0, 0), (0, padn)),
                              constant_values=-1e9)

    def step_token_unrolled(h_tok, cache, step_pos):
        """decode_layout="unrolled": python loop over layers, per-layer cache
        arrays in the carry — same math as ``step_token`` without the
        layer-indexed gather/update over the stacked cache."""
        abs_pos = p + step_pos
        scale = cfg.head_dim**-0.5
        kv_w = cfg.n_kv * cfg.head_dim
        allowed = (jnp.arange(total)[None, None, None, :] <= abs_pos) & key_valid[:, None, None, :]
        use_pallas = cfg.decode_attn == "pallas"
        if use_pallas:
            from f5tts_tpu.ops.pallas.decode_attention import decode_attention_auto
            # additive (b, total) bias: causal step bound + key padding —
            # per step, shared by all layers (~32 KB, rebuilt in XLA)
            sa_bias = jnp.where(allowed[:, 0, 0, :], 0.0, -1e9).astype(jnp.float32)
        new_cache = []
        for l in range(cfg.layers):
            blk = jax.tree.map(lambda x: x[l], params["blocks"])
            cak, cav = ca_k[l], ca_v[l]
            ck, cv = cache[l]
            xn = m.layer_norm(h_tok, cfg.ln_eps, blk["ln_sa"]["w"], blk["ln_sa"]["b"])
            if wqkv_fused is not None:
                qkv = xn @ wqkv_fused[l]
                q_, k_, v_ = (qkv[..., : cfg.hidden], qkv[..., cfg.hidden: cfg.hidden + kv_w],
                              qkv[..., cfg.hidden + kv_w:])
                q = _split_heads(q_ * scale, b, 1, cfg.heads)
                k_new = _split_heads(k_, b, 1, cfg.n_kv)
                v_new = _split_heads(v_, b, 1, cfg.n_kv)
            else:
                q = _split_heads(m.linear(blk["sa"]["q"], xn) * scale, b, 1, cfg.heads)
                k_new = _split_heads(m.linear(blk["sa"]["k"], xn), b, 1, cfg.n_kv)
                v_new = _split_heads(m.linear(blk["sa"]["v"], xn), b, 1, cfg.n_kv)
            if use_pallas:
                ck = lax.dynamic_update_slice(
                    ck, k_new.transpose(0, 1, 3, 2), (0, 0, 0, abs_pos))
                cv = lax.dynamic_update_slice(cv, v_new, (0, 0, abs_pos, 0))
                o = decode_attention_auto(q, ck, cv, sa_bias)
            else:
                ck = lax.dynamic_update_slice(ck, k_new, (0, 0, abs_pos, 0))
                cv = lax.dynamic_update_slice(cv, v_new, (0, 0, abs_pos, 0))
                lg = jnp.einsum("bhqd,bhkd->bhqk", q, _expand_kv(ck, cfg.heads),
                                preferred_element_type=jnp.float32)
                lg = jnp.where(allowed, lg, -1e9)
                pr = jax.nn.softmax(lg, axis=-1).astype(cv.dtype)
                o = jnp.einsum("bhqk,bhkd->bhqd", pr, _expand_kv(cv, cfg.heads))
            o = o.transpose(0, 2, 1, 3).reshape(b, 1, -1)
            h_tok = h_tok + m.linear(blk["sa"]["o"], o)
            xn = m.layer_norm(h_tok, cfg.ln_eps, blk["ln_ca"]["w"], blk["ln_ca"]["b"])
            q = _split_heads(m.linear(blk["ca"]["q"], xn) * scale, b, 1, cfg.heads)
            if use_pallas:
                o = decode_attention_auto(q, ca_kt_pad[l], ca_v_pad[l], ca_bias_pad)
                o = o.transpose(0, 2, 1, 3).reshape(b, 1, -1)
            else:
                lg = jnp.einsum("bhqd,bhkd->bhqk", q, cak, preferred_element_type=jnp.float32)
                if ca_bias is not None:
                    lg = lg + ca_bias
                pr = jax.nn.softmax(lg, axis=-1).astype(cav.dtype)
                o = jnp.einsum("bhqk,bhkd->bhqd", pr, cav).transpose(0, 2, 1, 3).reshape(b, 1, -1)
            h_tok = h_tok + m.linear(blk["ca"]["o"], o)
            y = m.layer_norm(h_tok, cfg.ln_eps, blk["ln_ff"]["w"], blk["ln_ff"]["b"])
            h_tok = h_tok + m.linear(blk["fc2"], jax.nn.gelu(m.linear(blk["fc1"], y), approximate=False))
            new_cache.append((ck, cv))
        return h_tok, tuple(new_cache)

    if unrolled:
        step_token = step_token_unrolled

    codebook_idx = jnp.arange(K)

    def step(carry, j):
        logits, cache, key, eos_frame = carry
        if row_seeds is None:
            key, sk = jax.random.split(key)
            sampled = _sample(sk, logits, temperature, top_k)  # (b, K)
        else:
            # per-row streams: fold (seed, step) into the base key so a row's
            # audio is reproducible regardless of which rows it batched with
            keys_j = jax.vmap(
                lambda s: jax.random.fold_in(jax.random.fold_in(key, s), j))(row_seeds)
            sampled = _sample_rows(keys_j, logits, temperature, top_k)  # (b, K)
        # codebook-0 EOS at code index i ends the utterance at frame i;
        # trailing codebooks still emit their delayed frames < eos_frame
        idx0 = j - 1
        hit = (sampled[:, 0] == eos_token) & (idx0 < eos_frame) & (idx0 < frames)
        eos_frame = jnp.where(hit, idx0, eos_frame)
        # delay forcing: codebook k at position j holds code index j-1-k;
        # outside [0, min(frames, eos_frame)) the pattern forces the pad token
        code_idx = (j - 1) - codebook_idx[None, :]  # (1, K)
        valid = (code_idx >= 0) & (code_idx < jnp.minimum(frames, eos_frame)[:, None])
        tok = jnp.where(valid, sampled, pad)

        x = _embed_codes(params, tok[..., None]).astype(compute_dtype)
        x = x + pos_table[None, p + j][:, None]
        h_tok, cache = step_token(x, cache, j)
        hn = m.layer_norm(h_tok, cfg.ln_eps, params["final_ln"]["w"], params["final_ln"]["b"])
        nlogits = jnp.einsum("bnh,khv->bknv", hn.astype(jnp.float32),
                             params["lm_heads"].astype(jnp.float32))[:, :, 0]
        return (nlogits, cache, key, eos_frame), tok

    eos0 = jnp.full((b,), frames, jnp.int32)
    return (logits0, cache, key, eos0), step, steps


def finalize_codes(codes: jnp.ndarray, eos_frame: jnp.ndarray, cfg: ParlerDecoderConfig,
                   max_code: int | None = None):
    """Post-decode masking shared by the batch and streaming paths: zero codes
    past each row's EOS length and clamp sampled specials below the codec
    codebook (the decoder vocab exceeds the DAC codebook; EOS is only
    intercepted on codebook 0 — strays in codebooks 1+ must not flow into the
    codec gather, which JAX would clamp silently)."""
    lengths = eos_frame
    frames = codes.shape[2]
    frame_pos = jnp.arange(frames)[None, None, :]
    codes = jnp.where(frame_pos < lengths[:, None, None], codes, 0)
    hi = cfg.vocab if max_code is None else max_code
    codes = jnp.where((codes >= 0) & (codes < hi), codes, 0)
    return codes, lengths


def parler_generate(
    params,
    cfg: ParlerDecoderConfig,
    enc: jnp.ndarray,  # (b, m, cross_dim)
    enc_mask: jnp.ndarray | None,
    frames: int,
    key: jax.Array,
    prompt_ids: jnp.ndarray | None = None,  # (b, p)
    prompt_mask: jnp.ndarray | None = None,
    bos_token: int | None = None,  # defaults to the extra pad/bos slot (vocab)
    pad_token: int | None = None,
    eos_token: int = 1024,
    temperature: float = 1.0,
    top_k: int = 0,
    max_code: int | None = None,  # codec codebook size; sampled specials >= it are zeroed
    row_seeds: jnp.ndarray | None = None,  # (b,) int32: per-row sampling streams
    compute_dtype=jnp.float32,
):
    """Delay-pattern AR generation with a static KV cache.

    Returns ``(codes (b, K, frames) int32, lengths (b,) int32)`` — codes are
    de-delayed; rows that emitted EOS in codebook 0 are padded with 0 past
    their length and report the shorter length (``finalize_codes``).
    """
    carry0, step, steps = _decode_ctx(
        params, cfg, enc, enc_mask, frames, key, prompt_ids, prompt_mask,
        bos_token, pad_token, eos_token, temperature, top_k, row_seeds, compute_dtype)
    (_, _, _, eos_frame), toks = lax.scan(step, carry0, jnp.arange(1, steps + 1))
    # toks: (steps, b, K) — row s holds position s+1 of the code stream
    codes = revert_delay_pattern(toks.transpose(1, 2, 0), frames)
    return finalize_codes(codes, eos_frame, cfg, max_code)


def parler_decode_segment(
    params,
    cfg: ParlerDecoderConfig,
    enc: jnp.ndarray,
    enc_mask: jnp.ndarray | None,
    frames: int,
    js: jnp.ndarray,  # contiguous positions within 1..steps (values past steps: outputs discarded)
    carry=None,  # None = prefill first; else the previous segment's carry
    *,
    key: jax.Array | None = None,
    prompt_ids: jnp.ndarray | None = None,
    prompt_mask: jnp.ndarray | None = None,
    bos_token: int | None = None,
    pad_token: int | None = None,
    eos_token: int = 1024,
    temperature: float = 1.0,
    top_k: int = 0,
    row_seeds: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
):
    """Decode a sub-range of code-stream positions — the STREAMING primitive.

    Returns ``(carry, toks (len(js), b, K))``. Segments of equal ``len(js)``
    share one compiled program; the KV cache rides the carry between calls;
    with ``row_seeds`` the sampling stream is keyed by (seed, position), so
    concatenated segment tokens are IDENTICAL to the single-scan
    ``parler_generate`` (test-pinned). When ``carry`` is supplied the prefill
    trace is dead-code-eliminated by XLA. ``js`` may run past ``steps`` (a
    padded tail segment): those positions write only the already-consumed last
    cache slot and cannot move ``eos_frame``, and their tokens are discarded
    by the caller."""
    if key is None:
        key = jax.random.PRNGKey(0)
    carry0, step, _ = _decode_ctx(
        params, cfg, enc, enc_mask, frames, key, prompt_ids, prompt_mask,
        bos_token, pad_token, eos_token, temperature, top_k, row_seeds, compute_dtype)
    carry, toks = lax.scan(step, carry0 if carry is None else carry, js)
    return carry, toks


# ---------------------------------------------------------------------------
# DAC codec decoder
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DacConfig:
    """descript/dac_44khz geometry (what indic-parler-tts decodes with)."""

    num_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    latent_dim: int = 1024  # config.hidden_size
    decoder_dim: int = 1536  # config.decoder_hidden_size
    rates: tuple = (8, 8, 4, 2)  # config.upsampling_ratios
    sampling_rate: int = 44100

    @property
    def hop(self) -> int:
        out = 1
        for r in self.rates:
            out *= r
        return out


def _snake(x, alpha):
    """x + 1/alpha * sin^2(alpha x), channel-last (alpha: (ch,))."""
    a = alpha.astype(jnp.float32)[None, None, :]
    x32 = x.astype(jnp.float32)
    y = x32 + jnp.square(jnp.sin(a * x32)) / (a + 1e-9)
    return y.astype(x.dtype)


def init_dac_decoder(key: jax.Array, cfg: DacConfig = DacConfig()):
    ks = jax.random.split(key, 6 + len(cfg.rates))
    proj = [m.init_conv1d(k, cfg.codebook_dim, cfg.latent_dim, 1)
            for k in jax.random.split(ks[1], cfg.num_codebooks)]
    quant = {
        "codebook": jax.random.normal(ks[0], (cfg.num_codebooks, cfg.codebook_size, cfg.codebook_dim)),
        "proj_w": jnp.stack([p["w"][0] for p in proj]),  # (K, cdim, latent)
        "proj_b": jnp.stack([p["b"] for p in proj]),
    }

    blocks = []
    ch = cfg.decoder_dim
    for i, r in enumerate(cfg.rates):
        out = cfg.decoder_dim // (2 ** (i + 1))
        kk = jax.random.split(ks[2 + i], 8)
        blocks.append({
            "alpha": jnp.ones((ch,)),
            "convt": m.init_conv1d(kk[0], ch, out, 2 * r),  # stored WIO; see _dac_convt
            "res": [
                {
                    "alpha1": jnp.ones((out,)),
                    "conv1": m.init_conv1d(kk[1 + 2 * j], out, out, 7),
                    "alpha2": jnp.ones((out,)),
                    "conv2": m.init_conv1d(kk[2 + 2 * j], out, out, 1),
                }
                for j in range(3)
            ],
        })
        ch = out
    return {
        "quant": quant,
        "conv1": m.init_conv1d(ks[-2], cfg.latent_dim, cfg.decoder_dim, 7),
        "blocks": blocks,
        "alpha_out": jnp.ones((ch,)),
        "conv2": m.init_conv1d(ks[-1], ch, 1, 7),
    }


def _dac_convt(p, x, stride: int):
    """ConvTranspose1d(kernel=2*stride, stride, padding=ceil(stride/2)) in
    channel-last form; kernel stored flipped-along-time WIO (torch convolves,
    ``lax.conv_transpose`` correlates — same convention as models/bigvgan.py)."""
    y = lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    crop = math.ceil(stride / 2)
    y = y[:, crop:-crop] if crop else y
    return y + p["b"].astype(x.dtype)


def dac_from_codes(params, codes: jnp.ndarray, compute_dtype=jnp.float32):
    """RVQ reconstruction: (b, K, n) codes -> (b, n, latent_dim)."""
    q = params["quant"]
    emb = q["codebook"][jnp.arange(codes.shape[1])[None, :, None], codes]  # (b,K,n,cdim)
    z = jnp.einsum("bknc,kcl->bnl", emb.astype(compute_dtype),
                   q["proj_w"].astype(compute_dtype))
    return z + jnp.sum(q["proj_b"], axis=0).astype(compute_dtype)


def dac_decode_codes(params, codes: jnp.ndarray, cfg: DacConfig = DacConfig(),
                     compute_dtype=jnp.float32):
    """(b, K, n) codes -> waveform (b, n * hop) in [-1, 1]."""
    x = dac_from_codes(params, codes, compute_dtype)
    x = m.conv1d(params["conv1"], x, padding=3)
    for blk, r in zip(params["blocks"], cfg.rates):
        x = _snake(x, blk["alpha"])
        x = _dac_convt(blk["convt"], x, r)
        # residual units with dilations 1, 3, 9 (pad 3*d keeps length)
        for ru, d in zip(blk["res"], (1, 3, 9)):
            y = m.conv1d(ru["conv1"], _snake(x, ru["alpha1"]), padding=3 * d, dilation=d)
            y = m.conv1d(ru["conv2"], _snake(y, ru["alpha2"]), padding=0)
            x = x + y
    x = _snake(x, params["alpha_out"])
    x = m.conv1d(params["conv2"], x, padding=3)
    return jnp.tanh(x[..., 0])


# ---------------------------------------------------------------------------
# torch -> JAX converters (HF state-dict layouts)
# ---------------------------------------------------------------------------


def _w(sd, name):
    return np.asarray(sd[name], np.float32)


def _lin_t(sd, prefix):
    """torch Linear (out,in) -> {'w': (in,out)} (+bias), float32-coerced.

    The transpose logic is shared with ``models.convert._lin`` — one place to
    fix layout handling for every converter in the package."""
    from f5tts_tpu.models.convert import _lin

    return {k: np.asarray(v, np.float32) for k, v in _lin(sd, prefix).items()}


def convert_t5_encoder(sd: dict, cfg: T5Config, prefix: str = "") -> dict:
    """T5EncoderModel state dict (optionally under ``text_encoder.``) -> pytree.

    Keys: ``shared.weight`` / ``encoder.embed_tokens.weight``,
    ``encoder.block.{i}.layer.0.SelfAttention.{q,k,v,o}.weight``,
    ``encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight``,
    ``encoder.block.{i}.layer.{0,1}.layer_norm.weight``,
    ``encoder.block.{i}.layer.1.DenseReluDense.{wi_0,wi_1,wo}.weight``,
    ``encoder.final_layer_norm.weight``."""
    from f5tts_tpu.models.dit import _stack

    e = f"{prefix}encoder"
    emb_key = f"{e}.embed_tokens.weight"
    if emb_key not in sd:
        emb_key = f"{prefix}shared.weight"
    blocks = []
    for i in range(cfg.layers):
        b0 = f"{e}.block.{i}.layer.0"
        b1 = f"{e}.block.{i}.layer.1"
        blocks.append({
            "ln1": {"g": _w(sd, f"{b0}.layer_norm.weight")},
            "q": _lin_t(sd, f"{b0}.SelfAttention.q"),
            "k": _lin_t(sd, f"{b0}.SelfAttention.k"),
            "v": _lin_t(sd, f"{b0}.SelfAttention.v"),
            "o": _lin_t(sd, f"{b0}.SelfAttention.o"),
            "ln2": {"g": _w(sd, f"{b1}.layer_norm.weight")},
            "wi_0": _lin_t(sd, f"{b1}.DenseReluDense.wi_0"),
            "wi_1": _lin_t(sd, f"{b1}.DenseReluDense.wi_1"),
            "wo": _lin_t(sd, f"{b1}.DenseReluDense.wo"),
        })
    params = {
        "embed": _w(sd, emb_key),
        "rel_bias": _w(sd, f"{e}.block.0.layer.0.SelfAttention.relative_attention_bias.weight"),
        "blocks": _stack(blocks),
        "final_ln": {"g": _w(sd, f"{e}.final_layer_norm.weight")},
    }
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


def convert_parler_decoder(
    sd: dict,
    cfg: ParlerDecoderConfig,
    prefix: str = "model.decoder.",
    lm_prefix: str = "lm_heads.",
    embed_prompts_key: str | None = None,
    enc_proj_prefix: str | None = None,
) -> dict:
    """Musicgen/ParlerTTS decoder state dict -> pytree.

    For a full ParlerTTS checkpoint pass ``prefix='decoder.model.decoder.'``,
    ``lm_prefix='decoder.lm_heads.'``, ``embed_prompts_key=
    'embed_prompts.weight'`` and ``enc_proj_prefix='enc_to_dec_proj'``."""
    from f5tts_tpu.models.dit import _stack

    def ln(p):
        return {"w": _w(sd, f"{p}.weight"), "b": _w(sd, f"{p}.bias")}

    blocks = []
    for i in range(cfg.layers):
        L = f"{prefix}layers.{i}"
        blocks.append({
            "ln_sa": ln(f"{L}.self_attn_layer_norm"),
            "sa": {
                "q": _lin_t(sd, f"{L}.self_attn.q_proj"),
                "k": _lin_t(sd, f"{L}.self_attn.k_proj"),
                "v": _lin_t(sd, f"{L}.self_attn.v_proj"),
                "o": _lin_t(sd, f"{L}.self_attn.out_proj"),
            },
            "ln_ca": ln(f"{L}.encoder_attn_layer_norm"),
            "ca": {
                "q": _lin_t(sd, f"{L}.encoder_attn.q_proj"),
                "k": _lin_t(sd, f"{L}.encoder_attn.k_proj"),
                "v": _lin_t(sd, f"{L}.encoder_attn.v_proj"),
                "o": _lin_t(sd, f"{L}.encoder_attn.out_proj"),
            },
            "ln_ff": ln(f"{L}.final_layer_norm"),
            "fc1": _lin_t(sd, f"{L}.fc1"),
            "fc2": _lin_t(sd, f"{L}.fc2"),
        })
    params = {
        "embed_tokens": np.stack(
            [_w(sd, f"{prefix}embed_tokens.{k}.weight") for k in range(cfg.codebooks)]),
        "blocks": _stack(blocks),
        "final_ln": ln(f"{prefix}layer_norm"),
        "lm_heads": np.stack(
            [_w(sd, f"{lm_prefix}{k}.weight").T for k in range(cfg.codebooks)]),
    }
    if embed_prompts_key is not None:
        params["embed_prompts"] = _w(sd, embed_prompts_key)
    else:
        params["embed_prompts"] = np.zeros((cfg.prompt_vocab, cfg.hidden), np.float32)
    if enc_proj_prefix is not None and f"{enc_proj_prefix}.weight" in sd:
        params["enc_proj"] = _lin_t(sd, enc_proj_prefix)
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


def _conv_wn(sd, prefix):
    """Conv weight, folding weight-norm parametrizations when present
    (new-style ``parametrizations.weight.original{0,1}`` or the legacy
    ``weight_g``/``weight_v`` pair descript-audio-codec checkpoints use)."""
    if f"{prefix}.weight" in sd:
        return _w(sd, f"{prefix}.weight"), _w(sd, f"{prefix}.bias")
    if f"{prefix}.weight_g" in sd:
        g, v = _w(sd, f"{prefix}.weight_g"), _w(sd, f"{prefix}.weight_v")
    else:
        g = _w(sd, f"{prefix}.parametrizations.weight.original0")
        v = _w(sd, f"{prefix}.parametrizations.weight.original1")
    norm = np.sqrt(np.sum(v * v, axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12), _w(sd, f"{prefix}.bias")


def convert_dac(sd: dict, cfg: DacConfig = DacConfig(), prefix: str = "") -> dict:
    """transformers DacModel state dict (decoder + quantizer) -> pytree."""

    def conv(p):
        w, b = _conv_wn(sd, p)  # torch Conv1d (out, in, k)
        return {"w": np.ascontiguousarray(w.transpose(2, 1, 0)), "b": b}

    def convt(p):
        w, b = _conv_wn(sd, p)  # torch ConvTranspose1d (in, out, k)
        return {"w": np.ascontiguousarray(w.transpose(2, 0, 1)[::-1]), "b": b}

    q = f"{prefix}quantizer.quantizers"
    quant = {
        "codebook": np.stack(
            [_w(sd, f"{q}.{i}.codebook.weight") for i in range(cfg.num_codebooks)]),
        "proj_w": np.stack(
            [_conv_wn(sd, f"{q}.{i}.out_proj")[0].transpose(2, 1, 0)[0]
             for i in range(cfg.num_codebooks)]),
        "proj_b": np.stack(
            [_w(sd, f"{q}.{i}.out_proj.bias") for i in range(cfg.num_codebooks)]),
    }
    d = f"{prefix}decoder"
    blocks = []
    for i in range(len(cfg.rates)):
        B = f"{d}.block.{i}"
        blocks.append({
            "alpha": _w(sd, f"{B}.snake1.alpha").reshape(-1),
            "convt": convt(f"{B}.conv_t1"),
            "res": [
                {
                    "alpha1": _w(sd, f"{B}.res_unit{j + 1}.snake1.alpha").reshape(-1),
                    "conv1": conv(f"{B}.res_unit{j + 1}.conv1"),
                    "alpha2": _w(sd, f"{B}.res_unit{j + 1}.snake2.alpha").reshape(-1),
                    "conv2": conv(f"{B}.res_unit{j + 1}.conv2"),
                }
                for j in range(3)
            ],
        })
    params = {
        "quant": quant,
        "conv1": conv(f"{d}.conv1"),
        "blocks": blocks,
        "alpha_out": _w(sd, f"{d}.snake1.alpha").reshape(-1),
        "conv2": conv(f"{d}.conv2"),
    }
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


def descript_dac_to_hf_keys(sd: dict, cfg: DacConfig = DacConfig(), prefix: str = "") -> dict:
    """Rename descript-audio-codec state-dict keys (what real ParlerTTS
    checkpoints embed under ``audio_encoder.model.``) to the transformers
    DacModel layout ``convert_dac`` consumes.

    descript's decoder is a positional ``nn.Sequential``:
    ``decoder.model.0`` first conv; ``decoder.model.{1+i}`` DecoderBlock i
    with ``block.0`` snake / ``block.1`` transposed conv / ``block.{2..4}``
    ResidualUnits (inner ``block.{0..3}`` = snake, conv k7, snake, conv k1);
    then final snake + conv. Quantizer names already match. Weight-norm
    tensors (``weight_g``/``weight_v``) pass through for ``_conv_wn``."""
    nb = len(cfg.rates)
    ren: dict[str, str] = {}

    def unit(src, dst):
        for suf in ("weight", "bias", "weight_g", "weight_v", "alpha",
                    "parametrizations.weight.original0",
                    "parametrizations.weight.original1"):
            ren[f"{src}.{suf}"] = f"{dst}.{suf}"

    unit("decoder.model.0", "decoder.conv1")
    for i in range(nb):
        B, H = f"decoder.model.{1 + i}", f"decoder.block.{i}"
        unit(f"{B}.block.0", f"{H}.snake1")
        unit(f"{B}.block.1", f"{H}.conv_t1")
        for j in range(3):
            R, RH = f"{B}.block.{2 + j}", f"{H}.res_unit{j + 1}"
            unit(f"{R}.block.0", f"{RH}.snake1")
            unit(f"{R}.block.1", f"{RH}.conv1")
            unit(f"{R}.block.2", f"{RH}.snake2")
            unit(f"{R}.block.3", f"{RH}.conv2")
    unit(f"decoder.model.{1 + nb}", "decoder.snake1")
    unit(f"decoder.model.{2 + nb}", "decoder.conv2")

    out = {}
    for k, v in sd.items():
        if prefix and not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        out[ren.get(k, k)] = v
    return out


def load_parler_checkpoint(path: str, t5_cfg: T5Config | None = None,
                           dec_cfg: ParlerDecoderConfig | None = None,
                           dac_cfg: DacConfig | None = None):
    """One ParlerTTSForConditionalGeneration state dict (.pt/.safetensors) ->
    (t5_params, dec_params, dac_params).

    HF layout (what ``ai4bharat/indic-parler-tts`` ships): the T5 description
    encoder under ``text_encoder.``, the codebook decoder under
    ``decoder.model.decoder.`` with LM heads at ``decoder.lm_heads.``, prompt
    embeddings at ``embed_prompts.weight``, optional ``enc_to_dec_proj``, and
    the DAC under ``audio_encoder.model.`` in descript's positional layout
    (translated by ``descript_dac_to_hf_keys``; HF-named DAC keys pass
    through untouched)."""
    from f5tts_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(path)
    t5_cfg = t5_cfg or T5Config()
    dec_cfg = dec_cfg or ParlerDecoderConfig()
    dac_cfg = dac_cfg or DacConfig()
    t5 = convert_t5_encoder(sd, t5_cfg, prefix="text_encoder.")
    dec = convert_parler_decoder(
        sd, dec_cfg, prefix="decoder.model.decoder.", lm_prefix="decoder.lm_heads.",
        embed_prompts_key="embed_prompts.weight", enc_proj_prefix="enc_to_dec_proj")
    dac_sd = descript_dac_to_hf_keys(sd, dac_cfg, prefix="audio_encoder.model.")
    dac = convert_dac(dac_sd, dac_cfg)
    return t5, dec, dac
