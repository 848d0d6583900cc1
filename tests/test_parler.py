"""Parler-TTS branch goldens vs the torch implementations in `transformers`.

The reference serves `ai4bharat/indic-parler-tts` purely as an external HF
component (`dhwani_config.json:81`); its architecture is ParlerTTS = T5
description encoder + MusicGen-style codebook decoder + DAC codec. These
tests pin our native JAX modules against the torch T5EncoderModel /
MusicgenForCausalLM / DacModel with random weights (the real checkpoint is
not fetchable here; the converters accept its state-dict naming).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from f5tts_tpu.models import parler as P


def _seed():
    torch.manual_seed(0)
    np.random.seed(0)


# ---------------------------------------------------------------------------
# T5 encoder
# ---------------------------------------------------------------------------


def _tiny_t5():
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=50, d_model=32, d_kv=8, d_ff=48, num_layers=3, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu", dropout_rate=0.0, use_cache=False,
    )
    model = T5EncoderModel(hf_cfg).eval()
    cfg = P.T5Config(vocab=50, d_model=32, d_kv=8, d_ff=48, heads=4, layers=3,
                     rel_buckets=8, rel_max_dist=20)
    return model, cfg


def test_t5_encoder_golden():
    _seed()
    model, cfg = _tiny_t5()
    ids = np.random.randint(0, cfg.vocab, (2, 11)).astype(np.int32)
    mask = np.ones((2, 11), bool)
    mask[1, 7:] = False
    ids[~mask] = 0

    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids).long(),
                    attention_mask=torch.from_numpy(mask).long()).last_hidden_state.numpy()

    params = P.convert_t5_encoder(model.state_dict(), cfg)
    out = np.asarray(P.t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(out[mask], ref[mask], atol=2e-5, rtol=1e-4)


def test_t5_relative_bucket_matches_torch():
    _seed()
    from transformers.models.t5.modeling_t5 import T5Attention

    n = 23
    pos = torch.arange(n)
    rel = pos[None, :] - pos[:, None]
    ref = T5Attention._relative_position_bucket(rel, bidirectional=True,
                                                num_buckets=8, max_distance=20).numpy()
    mine = np.asarray(P._rel_bucket(jnp.asarray(rel.numpy()), 8, 20))
    np.testing.assert_array_equal(mine, ref)


# ---------------------------------------------------------------------------
# codebook decoder vs MusicgenForCausalLM
# ---------------------------------------------------------------------------


def _tiny_musicgen():
    from transformers.models.musicgen.configuration_musicgen import MusicgenDecoderConfig
    from transformers.models.musicgen.modeling_musicgen import MusicgenForCausalLM

    hf_cfg = MusicgenDecoderConfig(
        vocab_size=40, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        ffn_dim=64, num_codebooks=3, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, max_position_embeddings=256, audio_channels=1,
        scale_embedding=False, activation_function="gelu",
    )
    model = MusicgenForCausalLM(hf_cfg).eval()
    cfg = P.ParlerDecoderConfig(vocab=40, codebooks=3, hidden=32, layers=2,
                                heads=4, ffn=64, cross_dim=32, prompt_vocab=16)
    return model, cfg


def test_parler_decoder_forward_golden():
    _seed()
    model, cfg = _tiny_musicgen()
    b, n, m_len = 2, 9, 6
    codes = np.random.randint(0, cfg.vocab + 1, (b, cfg.codebooks, n)).astype(np.int32)
    enc = np.random.randn(b, m_len, cfg.hidden).astype(np.float32)
    enc_mask = np.ones((b, m_len), bool)
    enc_mask[1, 4:] = False

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(codes.reshape(b * cfg.codebooks, n)).long(),
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=torch.from_numpy(enc_mask).long(),
        ).logits.numpy().reshape(b, cfg.codebooks, n, cfg.vocab)

    params = P.convert_parler_decoder(model.state_dict(), cfg)
    out = np.asarray(P.parler_decoder_forward(
        params, cfg, jnp.asarray(codes), jnp.asarray(enc), jnp.asarray(enc_mask)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_delay_pattern_matches_hf():
    _seed()
    model, cfg = _tiny_musicgen()
    b, n = 2, 5
    K, pad = cfg.codebooks, cfg.vocab
    codes = np.random.randint(0, cfg.vocab, (b, K, n)).astype(np.int64)

    # HF's contract includes the leading BOS position (positions <= k forced
    # to pad); ours is the pure shifted stream. [BOS ; build(codes)] == HF
    # applied to [BOS ; codes].
    hf_in = np.concatenate([np.full((b, K, 1), pad), codes], axis=2)
    _, hf_pattern = model.build_delay_pattern_mask(
        torch.from_numpy(hf_in.reshape(b * K, n + 1)), pad_token_id=pad, max_length=n + K)
    mine = np.concatenate(
        [np.full((b, K, 1), pad), P.build_delay_pattern(codes, pad, n + K - 1)], axis=2)
    np.testing.assert_array_equal(mine.reshape(b * K, n + K), hf_pattern.numpy())

    # revert is the exact inverse on the valid span
    rt = np.asarray(P.revert_delay_pattern(
        jnp.asarray(P.build_delay_pattern(codes, pad, n + K - 1)), n))
    np.testing.assert_array_equal(rt, codes)


@pytest.mark.slow
def test_parler_generate_consistent_with_forward():
    """KV-cache incremental decode == teacher-forced forward (and == torch),
    verified by replaying the greedy generation through both full passes."""
    _seed()
    model, cfg = _tiny_musicgen()
    b, m_len, frames = 2, 6, 5
    K, pad = cfg.codebooks, cfg.vocab
    enc = np.random.randn(b, m_len, cfg.hidden).astype(np.float32)
    params = P.convert_parler_decoder(model.state_dict(), cfg)

    codes, lengths = P.parler_generate(
        params, cfg, jnp.asarray(enc), None, frames, jax.random.PRNGKey(0),
        temperature=0.0, eos_token=-1)
    codes = np.asarray(codes)
    assert codes.shape == (b, K, frames) and np.all(np.asarray(lengths) == frames)

    # rebuild the delayed stream the generator walked: [BOS ; delayed codes]
    steps = frames + K - 1
    delayed = P.build_delay_pattern(codes, pad, steps)
    full = np.concatenate([np.full((b, K, 1), pad), delayed], axis=2)  # bos==pad slot

    logits_mine = np.asarray(P.parler_decoder_forward(
        params, cfg, jnp.asarray(full[..., :-1].astype(np.int32)), jnp.asarray(enc), None))
    with torch.no_grad():
        logits_ref = model(
            input_ids=torch.from_numpy(full[..., :-1].reshape(b * K, steps)).long(),
            encoder_hidden_states=torch.from_numpy(enc),
        ).logits.numpy().reshape(b, K, steps, cfg.vocab)

    # positions whose *target* is a real (non-forced) token
    idx = np.arange(steps)[None, :] - np.arange(K)[:, None]  # target pos j+1 -> code idx j-k
    valid = (idx >= 0) & (idx < frames)
    valid = np.broadcast_to(valid[None], (b, K, steps))
    np.testing.assert_array_equal(
        logits_mine.argmax(-1)[valid], full[..., 1:][valid])
    np.testing.assert_array_equal(
        logits_ref.argmax(-1)[valid], full[..., 1:][valid])


def test_parler_generate_eos_and_prompt():
    _seed()
    model, cfg = _tiny_musicgen()
    b, m_len, frames, p = 2, 4, 6, 5
    enc = np.random.randn(b, m_len, cfg.hidden).astype(np.float32)
    params = P.convert_parler_decoder(model.state_dict(), cfg)
    prompt = np.random.randint(0, cfg.prompt_vocab, (b, p)).astype(np.int32)
    pmask = np.ones((b, p), bool)
    pmask[0, 3:] = False

    codes, lengths = P.parler_generate(
        params, cfg, jnp.asarray(enc), None, frames, jax.random.PRNGKey(1),
        prompt_ids=jnp.asarray(prompt), prompt_mask=jnp.asarray(pmask),
        temperature=0.7, top_k=8, eos_token=3)
    codes, lengths = np.asarray(codes), np.asarray(lengths)
    assert codes.shape == (b, cfg.codebooks, frames)
    assert np.all((lengths >= 0) & (lengths <= frames))
    # past-length frames are zeroed (DAC-safe), in-range codes stay in vocab
    for i in range(b):
        assert np.all(codes[i, :, lengths[i]:] == 0)
    assert codes.max() < cfg.vocab and codes.min() >= 0


# ---------------------------------------------------------------------------
# DAC codec decoder
# ---------------------------------------------------------------------------


def _tiny_dac():
    from transformers import DacConfig as HFDacConfig
    from transformers import DacModel

    hf_cfg = HFDacConfig(
        encoder_hidden_size=16, downsampling_ratios=[2, 4], decoder_hidden_size=16,
        upsampling_ratios=[4, 2], n_codebooks=4, codebook_size=32, codebook_dim=6,
        hidden_size=24, sampling_rate=16000,
    )
    model = DacModel(hf_cfg).eval()
    cfg = P.DacConfig(num_codebooks=4, codebook_size=32, codebook_dim=6,
                      latent_dim=24, decoder_dim=16, rates=(4, 2))
    return model, cfg


def test_dac_decode_golden():
    _seed()
    model, cfg = _tiny_dac()
    b, n = 2, 12
    codes = np.random.randint(0, cfg.codebook_size, (b, cfg.num_codebooks, n))

    with torch.no_grad():
        ref = model.decode(audio_codes=torch.from_numpy(codes).long()).audio_values.numpy()

    params = P.convert_dac(model.state_dict(), cfg)
    out = np.asarray(P.dac_decode_codes(params, jnp.asarray(codes), cfg))
    assert out.shape == (b, n * cfg.hop)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_dac_weight_norm_folding():
    _seed()
    model, cfg = _tiny_dac()
    codes = np.random.randint(0, cfg.codebook_size, (1, cfg.num_codebooks, 7))
    plain = P.convert_dac(model.state_dict(), cfg)
    model.apply_weight_norm()
    folded = P.convert_dac(model.state_dict(), cfg)
    a = np.asarray(P.dac_decode_codes(plain, jnp.asarray(codes), cfg))
    b_ = np.asarray(P.dac_decode_codes(folded, jnp.asarray(codes), cfg))
    np.testing.assert_allclose(a, b_, atol=1e-5)


# ---------------------------------------------------------------------------
# full non-flow stack, BASELINE config #3 geometry (batch 16)
# ---------------------------------------------------------------------------


def test_parler_full_stack_batch16():
    _seed()
    t5 = P.T5Config(vocab=50, d_model=24, d_kv=6, d_ff=32, heads=4, layers=2,
                    rel_buckets=8, rel_max_dist=20)
    dec = P.ParlerDecoderConfig(vocab=40, codebooks=4, hidden=32, layers=2,
                                heads=4, ffn=48, cross_dim=24, prompt_vocab=50)
    dac = P.DacConfig(num_codebooks=4, codebook_size=40, codebook_dim=6,
                      latent_dim=24, decoder_dim=16, rates=(4, 2))
    kt, kd, kq, kg = jax.random.split(jax.random.PRNGKey(0), 4)
    t5_p = P.init_t5_encoder(kt, t5)
    dec_p = P.init_parler_decoder(kd, dec)
    dac_p = P.init_dac_decoder(kq, dac)

    b, frames = 16, 6
    desc = jnp.asarray(np.random.randint(0, 50, (b, 7)).astype(np.int32))
    prompt = jnp.asarray(np.random.randint(0, 50, (b, 5)).astype(np.int32))

    def synth(desc, prompt):
        enc = P.t5_encode(t5_p, t5, desc)
        codes, lengths = P.parler_generate(
            dec_p, dec, enc, None, frames, kg, prompt_ids=prompt,
            temperature=0.9, top_k=4, eos_token=-1)
        wave = P.dac_decode_codes(dac_p, codes, dac)
        return codes, lengths, wave

    codes, lengths, wave = jax.jit(synth)(desc, prompt)
    assert wave.shape == (b, frames * dac.hop)
    assert np.all(np.isfinite(np.asarray(wave)))
    assert codes.shape == (b, dec.codebooks, frames)


def test_parler_loss_and_grads():
    """Teacher-forced CE over delayed codes: finite, pad positions excluded,
    gradients flow to every decoder parameter."""
    _seed()
    _, cfg = _tiny_musicgen()
    b, n, m_len, frames = 2, 6, 5, 4
    K, pad = cfg.codebooks, cfg.vocab
    params = P.init_parler_decoder(jax.random.PRNGKey(2), cfg)
    enc = jnp.asarray(np.random.randn(b, m_len, cfg.hidden).astype(np.float32))
    codes = np.random.randint(0, cfg.vocab, (b, K, frames))
    delayed = P.build_delay_pattern(codes, pad, frames + K - 1)
    full = np.concatenate([np.full((b, K, 1), pad), delayed], axis=2).astype(np.int32)
    mask = np.ones_like(full, bool)

    def loss_fn(p):
        return P.parler_loss(p, cfg, jnp.asarray(full), jnp.asarray(mask), enc,
                             pad_token=pad)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    flat = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    assert all(np.isfinite(v) for v in flat)
    # every block / head / embedding receives gradient
    assert float(jnp.abs(grads["lm_heads"]).sum()) > 0
    assert float(jnp.abs(grads["embed_tokens"]).sum()) > 0
    assert float(jnp.abs(grads["blocks"]["sa"]["q"]["w"]).sum()) > 0


def test_dac_descript_layout_conversion():
    """Real ParlerTTS checkpoints carry the DAC in descript's positional
    Sequential layout with legacy weight_g/weight_v norm tensors; the key
    translator + folding must land on the same decode as the HF layout."""
    _seed()
    model, cfg = _tiny_dac()
    hf_sd = {k: v.numpy() for k, v in model.state_dict().items()}

    # build a descript-style dict by inverse-renaming + weight_g/v splitting
    inv = {v: k for k, v in _descript_rename_table(cfg).items()}
    desc_sd = {}
    for k, v in hf_sd.items():
        name = inv.get(k, k)
        if name.endswith(".weight") and ("conv" in k or "snake" not in k) and v.ndim == 3:
            w = v
            g = np.sqrt((w * w).sum(axis=(1, 2), keepdims=True))
            desc_sd[name[:-7] + ".weight_g"] = g
            desc_sd[name[:-7] + ".weight_v"] = w  # ||v||*g/||v|| == w when g=||w||
        else:
            desc_sd[name] = v

    renamed = P.descript_dac_to_hf_keys(
        {f"audio_encoder.model.{k}": v for k, v in desc_sd.items()},
        cfg, prefix="audio_encoder.model.")
    params_a = P.convert_dac(renamed, cfg)
    params_b = P.convert_dac(hf_sd, cfg)
    codes = np.random.randint(0, cfg.codebook_size, (1, cfg.num_codebooks, 9))
    a = np.asarray(P.dac_decode_codes(params_a, jnp.asarray(codes), cfg))
    b = np.asarray(P.dac_decode_codes(params_b, jnp.asarray(codes), cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def _descript_rename_table(cfg):
    """hf-key -> descript-key inverse of descript_dac_to_hf_keys' table."""
    nb = len(cfg.rates)
    ren = {}

    def unit(src, dst):
        for suf in ("weight", "bias", "alpha"):
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
    return ren


def test_parler_gqa_generate_consistent_with_forward():
    """GQA variant (kv_heads < heads, parler-tts v1.1 configs): the KV-cache
    decode must replay exactly through the teacher-forced forward."""
    _seed()
    cfg = P.ParlerDecoderConfig(vocab=40, codebooks=3, hidden=32, layers=2,
                                heads=4, ffn=64, cross_dim=32, prompt_vocab=16,
                                kv_heads=2, cross_kv_heads=1)
    params = P.init_parler_decoder(jax.random.PRNGKey(5), cfg)
    assert params["blocks"]["sa"]["k"]["w"].shape[-1] == 2 * cfg.head_dim
    assert params["blocks"]["ca"]["k"]["w"].shape[-1] == 1 * cfg.head_dim
    b, m_len, frames = 2, 6, 5
    K, pad = cfg.codebooks, cfg.vocab
    enc = jnp.asarray(np.random.randn(b, m_len, cfg.hidden).astype(np.float32))

    codes, _ = P.parler_generate(params, cfg, enc, None, frames,
                                 jax.random.PRNGKey(0), temperature=0.0, eos_token=-1)
    codes = np.asarray(codes)
    steps = frames + K - 1
    delayed = P.build_delay_pattern(codes, pad, steps)
    full = np.concatenate([np.full((b, K, 1), pad), delayed], axis=2)
    logits = np.asarray(P.parler_decoder_forward(
        params, cfg, jnp.asarray(full[..., :-1].astype(np.int32)), enc, None))
    idx = np.arange(steps)[None, :] - np.arange(K)[:, None]
    valid = np.broadcast_to(((idx >= 0) & (idx < frames))[None], (b, K, steps))
    np.testing.assert_array_equal(logits.argmax(-1)[valid], full[..., 1:][valid])


def test_parler_prompt_left_pad_row_isolation():
    """Left-padded prompts (the official batched-inference convention): a
    row's greedy generation must not depend on its batch neighbors."""
    _seed()
    _, cfg = _tiny_musicgen()
    params = P.init_parler_decoder(jax.random.PRNGKey(7), cfg)
    m_len, frames, p = 4, 4, 6
    enc_row = np.random.randn(1, m_len, cfg.hidden).astype(np.float32)
    enc = jnp.asarray(np.concatenate([enc_row, enc_row * 0.5], axis=0))

    def left(ids):
        out = np.zeros(p, np.int32)
        msk = np.zeros(p, bool)
        out[p - len(ids):] = ids
        msk[p - len(ids):] = True
        return out, msk

    short, short_m = left([3, 1, 4])
    long_, long_m = left([2, 7, 1, 8, 2])
    prompts = jnp.asarray(np.stack([short, long_]))
    masks = jnp.asarray(np.stack([short_m, long_m]))
    codes_a, _ = P.parler_generate(params, cfg, enc, None, frames, jax.random.PRNGKey(0),
                                   prompt_ids=prompts, prompt_mask=masks,
                                   temperature=0.0, eos_token=-1)

    prompts_b = jnp.asarray(np.stack([short, short]))
    masks_b = jnp.asarray(np.stack([short_m, short_m]))
    enc_b = jnp.asarray(np.concatenate([enc_row, enc_row], axis=0))
    codes_b, _ = P.parler_generate(params, cfg, enc_b, None, frames, jax.random.PRNGKey(0),
                                   prompt_ids=prompts_b, prompt_mask=masks_b,
                                   temperature=0.0, eos_token=-1)
    np.testing.assert_array_equal(np.asarray(codes_a)[0], np.asarray(codes_b)[0])


def test_parler_loss_default_pad_exclusion():
    """pad exclusion must be ON by default: build_delay_pattern fills with the
    extra pad/bos slot (cfg.vocab), whose clamped gather would otherwise train
    real token vocab-1 where HF sets the label to -100."""
    _seed()
    _, cfg = _tiny_musicgen()
    b, m_len, frames = 2, 5, 4
    K, pad = cfg.codebooks, cfg.vocab
    params = P.init_parler_decoder(jax.random.PRNGKey(2), cfg)
    enc = jnp.asarray(np.random.randn(b, m_len, cfg.hidden).astype(np.float32))
    codes = np.random.randint(0, cfg.vocab, (b, K, frames))
    delayed = P.build_delay_pattern(codes, pad, frames + K - 1)
    full = np.concatenate([np.full((b, K, 1), pad), delayed], axis=2).astype(np.int32)
    mask = np.ones_like(full, bool)

    default = float(P.parler_loss(params, cfg, jnp.asarray(full), jnp.asarray(mask), enc))
    explicit = float(P.parler_loss(params, cfg, jnp.asarray(full), jnp.asarray(mask), enc,
                                   pad_token=pad))
    disabled = float(P.parler_loss(params, cfg, jnp.asarray(full), jnp.asarray(mask), enc,
                                   pad_token=-1))
    assert default == explicit
    assert default != disabled  # pad targets were being trained when disabled


def test_parler_generate_end_to_end_vs_hf_generate():
    """VERDICT #7: one golden pinning the WHOLE AR loop against HF's own
    ``.generate`` machinery — tiny MusicgenForConditionalGeneration
    (T5 text encoder -> enc_to_dec_proj -> delay-pattern codebook decoder),
    greedy, text ids in -> audio codes out. HF's generate builds its delay
    mask, runs its incremental loop and reverts the pattern internally (codes
    captured at the audio_encoder.decode boundary); ours runs t5_encode +
    parler_generate on the converted weights. Combined with the DAC decode
    goldens above, this pins description -> waveform end-to-end.
    (The decoder-prompt path is ParlerTTS-specific — no HF class in this
    image implements it — and is covered by the replay/row-isolation tests.)"""
    from types import SimpleNamespace

    from transformers import EncodecConfig
    from transformers import T5Config as HFT5Config
    from transformers.models.musicgen.configuration_musicgen import (
        MusicgenConfig,
        MusicgenDecoderConfig,
    )
    from transformers.models.musicgen.modeling_musicgen import MusicgenForConditionalGeneration

    _seed()
    dec_hf = MusicgenDecoderConfig(
        vocab_size=40, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        ffn_dim=64, num_codebooks=3, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, max_position_embeddings=256, audio_channels=1,
        scale_embedding=False, activation_function="gelu",
        pad_token_id=40, bos_token_id=40, eos_token_id=None,
    )
    t5_hf = HFT5Config(vocab_size=50, d_model=24, d_kv=8, d_ff=48, num_layers=2,
                       num_heads=3, relative_attention_num_buckets=8,
                       relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
                       dropout_rate=0.0, use_cache=False)
    enc_hf = EncodecConfig(hidden_size=16, num_filters=4, num_residual_layers=1,
                           codebook_size=64, codebook_dim=16, upsampling_ratios=[4, 4],
                           audio_channels=1)
    model = MusicgenForConditionalGeneration(
        MusicgenConfig.from_sub_models_config(t5_hf, enc_hf, dec_hf)).eval()

    b, nt, frames, K = 2, 7, 5, 3
    ids = np.random.randint(2, 50, (b, nt)).astype(np.int64)
    mask = np.ones((b, nt), bool)
    mask[1, 5:] = False
    ids[~mask] = 0

    captured = {}

    def fake_decode(audio_codes, *a, **k):
        captured["codes"] = audio_codes.detach().clone()
        return SimpleNamespace(audio_values=torch.zeros(audio_codes.shape[1], 1, 10))

    model.audio_encoder.decode = fake_decode
    with torch.no_grad():
        model.generate(input_ids=torch.from_numpy(ids),
                       attention_mask=torch.from_numpy(mask).long(),
                       do_sample=False, max_new_tokens=frames + K - 1, guidance_scale=1.0)
    want = captured["codes"].numpy()[0]  # (b, K, frames)
    assert want.shape == (b, K, frames)

    sd = model.state_dict()
    t5_cfg = P.T5Config(vocab=50, d_model=24, d_kv=8, d_ff=48, heads=3, layers=2,
                        rel_buckets=8, rel_max_dist=20)
    dec_cfg = P.ParlerDecoderConfig(vocab=40, codebooks=3, hidden=32, layers=2,
                                    heads=4, ffn=64, cross_dim=24, prompt_vocab=1)
    t5_params = P.convert_t5_encoder(sd, t5_cfg, prefix="text_encoder.")
    dec_params = P.convert_parler_decoder(
        sd, dec_cfg, prefix="decoder.model.decoder.", lm_prefix="decoder.lm_heads.",
        enc_proj_prefix="enc_to_dec_proj")

    enc = P.t5_encode(t5_params, t5_cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask))
    codes, lengths = P.parler_generate(
        dec_params, dec_cfg, enc, jnp.asarray(mask), frames, jax.random.PRNGKey(0),
        temperature=0.0, eos_token=-1)
    codes = np.asarray(codes)
    assert np.all(np.asarray(lengths) == frames)
    np.testing.assert_array_equal(codes, want)


def test_unrolled_decode_layout_matches_stacked():
    """decode_layout="unrolled" (per-layer cache carry, no layer gather) is
    bit-compatible with the stacked scan layout — same codes, same lengths,
    with a prompt, GQA, and per-row seeds in play."""
    import dataclasses

    _seed()
    cfg = P.ParlerDecoderConfig(vocab=40, codebooks=3, hidden=32, layers=2,
                                heads=4, ffn=64, cross_dim=32, prompt_vocab=16,
                                kv_heads=2, cross_kv_heads=2)
    params = P.init_parler_decoder(jax.random.PRNGKey(0), cfg)
    b, m_len, frames = 2, 6, 7
    rng = np.random.default_rng(5)
    enc = jnp.asarray(rng.standard_normal((b, m_len, cfg.cross_dim)), jnp.float32)
    enc_mask = jnp.asarray([[True] * 6, [True] * 4 + [False] * 2])
    prompt = jnp.asarray(rng.integers(0, cfg.prompt_vocab, (b, 3)), jnp.int32)
    seeds = jnp.asarray([11, 12], jnp.int32)

    outs = {}
    for layout, fuse in (("stacked", False), ("unrolled", False), ("unrolled", True)):
        c = dataclasses.replace(cfg, decode_layout=layout, fuse_decode_qkv=fuse)
        codes, lengths = P.parler_generate(
            params, c, enc, enc_mask, frames, jax.random.PRNGKey(3),
            prompt_ids=prompt, temperature=0.8, top_k=5, row_seeds=seeds)
        outs[(layout, fuse)] = (np.asarray(codes), np.asarray(lengths))

    for k in [("unrolled", False), ("unrolled", True)]:
        np.testing.assert_array_equal(outs[("stacked", False)][0], outs[k][0])
        np.testing.assert_array_equal(outs[("stacked", False)][1], outs[k][1])


def test_pallas_decode_attn_matches_xla():
    """decode_attn="pallas" (fused single-pass cache-attention kernel,
    interpret mode on CPU) reproduces the XLA decode path exactly — same
    codes, same lengths — with a prompt, GQA, enc padding, per-row sampling
    seeds, and the rounded-up (16-multiple) cache allocation in play."""
    import dataclasses

    _seed()
    cfg = P.ParlerDecoderConfig(vocab=40, codebooks=3, hidden=32, layers=2,
                                heads=4, ffn=64, cross_dim=32, prompt_vocab=16,
                                kv_heads=2, cross_kv_heads=2)
    params = P.init_parler_decoder(jax.random.PRNGKey(0), cfg)
    b, m_len, frames = 2, 16, 5  # cross enc pads to the lane tile in-model
    rng = np.random.default_rng(5)
    enc = jnp.asarray(rng.standard_normal((b, m_len, cfg.cross_dim)), jnp.float32)
    enc_mask = jnp.asarray([[True] * 16, [True] * 9 + [False] * 7])
    prompt = jnp.asarray(rng.integers(0, cfg.prompt_vocab, (b, 3)), jnp.int32)
    seeds = jnp.asarray([11, 12], jnp.int32)

    outs = {}
    for attn in ("xla", "pallas"):
        c = dataclasses.replace(cfg, decode_layout="unrolled", decode_attn=attn)
        codes, lengths = P.parler_generate(
            params, c, enc, enc_mask, frames, jax.random.PRNGKey(3),
            prompt_ids=prompt, temperature=0.8, top_k=5, row_seeds=seeds)
        outs[attn] = (np.asarray(codes), np.asarray(lengths))

    np.testing.assert_array_equal(outs["xla"][0], outs["pallas"][0])
    np.testing.assert_array_equal(outs["xla"][1], outs["pallas"][1])
