"""AR-branch engine: batched decode + vocode (BASELINE config #3 shape)."""

import numpy as np

import jax

from f5tts_tpu.engine.ar_engine import AREngineConfig, ARTTSEngine
from f5tts_tpu.models.ar import ARConfig, init_ar
from f5tts_tpu.models.vocos import VocosConfig, init_vocos
from f5tts_tpu.text.tokenizer import Tokenizer


def test_ar_engine_batch():
    ar_cfg = ARConfig(dim=48, depth=2, heads=2, dim_head=24, ff_mult=2, mel_dim=20, text_num_embeds=120)
    voc_cfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64, num_layers=2)
    engine = ARTTSEngine(
        init_ar(jax.random.PRNGKey(0), ar_cfg), ar_cfg,
        init_vocos(jax.random.PRNGKey(1), voc_cfg),
        Tokenizer.from_texts(["hello autoregressive branch"]),
        AREngineConfig(vocoder=voc_cfg, text_pad=32, max_frames=48, compute_dtype="float32"),
    )
    texts = [f"utterance {i}" for i in range(4)]
    waves = engine.synthesize_batch(texts)
    assert len(waves) == 4
    for w in waves:
        assert w.ndim == 1
        assert np.all(np.isfinite(w))


def test_parler_engine_batch16():
    """BASELINE config #3 geometry: ParlerTTS-architecture branch at batch 16."""
    from f5tts_tpu.engine.ar_engine import ParlerEngineConfig, ParlerTTSEngine
    from f5tts_tpu.models import parler as P

    t5 = P.T5Config(vocab=60, d_model=24, d_kv=6, d_ff=32, heads=4, layers=2,
                    rel_buckets=8, rel_max_dist=20)
    dec = P.ParlerDecoderConfig(vocab=40, codebooks=4, hidden=32, layers=2,
                                heads=4, ffn=48, cross_dim=24, prompt_vocab=60)
    dac = P.DacConfig(num_codebooks=4, codebook_size=40, codebook_dim=6,
                      latent_dim=24, decoder_dim=16, rates=(4, 2))
    kt, kd, kq = jax.random.split(jax.random.PRNGKey(0), 3)
    eng = ParlerTTSEngine(
        P.init_t5_encoder(kt, t5), t5,
        P.init_parler_decoder(kd, dec), dec,
        P.init_dac_decoder(kq, dac), dac,
        ParlerEngineConfig(max_frames=8, desc_pad=12, prompt_pad=10,
                           temperature=0.8, top_k=4, eos_token=3,
                           compute_dtype="float32"),
        encode_fn=lambda s: [ord(c) % 60 for c in s],
    )
    descs = [f"a calm speaker number {i}" for i in range(16)]
    prompts = [f"utterance {i}" for i in range(16)]
    waves = eng.synthesize_batch(descs, prompts)
    assert len(waves) == 16
    for w in waves:
        assert w.ndim == 1 and len(w) <= 8 * dac.hop
        assert np.all(np.isfinite(w))
    # same seed -> deterministic
    waves2 = eng.synthesize_batch(descs, prompts)
    np.testing.assert_array_equal(waves[0], waves2[0])


def test_pad_ids_left_truncation_keeps_tail():
    """Over-long left-padded prompts must keep their LAST pad_to tokens — the
    transcript tail abuts the decoder start in the trained position layout;
    right-padded descriptions keep the head."""
    from f5tts_tpu.engine.ar_engine import ParlerTTSEngine

    ids = list(range(1, 11))  # 10 tokens, pad_to 4
    out, mask = ParlerTTSEngine._pad_ids(None, [ids], 4, side="left")
    assert out[0].tolist() == [7, 8, 9, 10]
    assert mask[0].all()
    out, mask = ParlerTTSEngine._pad_ids(None, [ids], 4, side="right")
    assert out[0].tolist() == [1, 2, 3, 4]
    # short prompts are untouched: left-padded into the tail slots
    out, mask = ParlerTTSEngine._pad_ids(None, [[5, 6]], 4, side="left")
    assert out[0].tolist() == [0, 0, 5, 6]
    assert mask[0].tolist() == [False, False, True, True]


def _tiny_parler_engine(temperature=0.0, top_k=0, batch_buckets=(1, 2, 4)):
    from f5tts_tpu.engine.ar_engine import ParlerEngineConfig, ParlerTTSEngine
    from f5tts_tpu.models import parler as P

    t5 = P.T5Config(vocab=60, d_model=24, d_kv=6, d_ff=32, heads=4, layers=2,
                    rel_buckets=8, rel_max_dist=20)
    dec = P.ParlerDecoderConfig(vocab=40, codebooks=4, hidden=32, layers=2,
                                heads=4, ffn=48, cross_dim=24, prompt_vocab=60)
    dac = P.DacConfig(num_codebooks=4, codebook_size=40, codebook_dim=6,
                      latent_dim=24, decoder_dim=16, rates=(4, 2))
    kt, kd, kq = jax.random.split(jax.random.PRNGKey(0), 3)
    return ParlerTTSEngine(
        P.init_t5_encoder(kt, t5), t5,
        P.init_parler_decoder(kd, dec), dec,
        P.init_dac_decoder(kq, dac), dac,
        ParlerEngineConfig(max_frames=8, desc_pad=24, prompt_pad=24,
                           temperature=temperature, top_k=top_k, eos_token=-1,
                           compute_dtype="float32", batch_buckets=batch_buckets),
        encode_fn=lambda s: [ord(c) % 60 for c in s],
    )


def test_parler_rows_split_oversized_batches():
    """A burst above the top batch bucket must split into bucket-sized solves
    rather than compiling a never-warmed exact-size program at serve time."""
    from f5tts_tpu.engine.ar_engine import ParlerRow

    eng = _tiny_parler_engine()
    rows = [ParlerRow("a speaker.", f"utterance {i}.", seed=i) for i in range(7)]
    results = eng.synthesize_rows(rows)  # buckets: 4 + (3->4 padded)
    assert len(results) == 7
    assert all(np.isfinite(w).all() for w, _ in results)
    # only bucket-sized programs were compiled (4 and 4, not 7)
    assert all(k[0] in eng.cfg.batch_buckets for k in eng._cache)


def test_parler_row_seed_composition_invariance():
    """With temperature>0, a row's audio depends only on its own seed — not
    on batch size or which rows it co-batched with (continuous batching mixes
    requests arbitrarily)."""
    from f5tts_tpu.engine.ar_engine import ParlerRow

    eng = _tiny_parler_engine(temperature=0.9, top_k=8)
    target = ParlerRow("a calm speaker.", "the target utterance.", seed=41)
    alone = eng.synthesize_rows([target])[0][0]
    others = [ParlerRow("another speaker.", f"filler {i}.", seed=100 + i) for i in range(3)]
    batched = eng.synthesize_rows(others[:1] + [target] + others[1:])[1][0]
    np.testing.assert_array_equal(alone, batched)


def test_parler_validate_lengths():
    import pytest

    eng = _tiny_parler_engine()
    eng.validate_lengths("short desc.", "short text.")
    with pytest.raises(ValueError, match="token budget"):
        eng.validate_lengths("short desc.", "x" * 100)
    with pytest.raises(ValueError, match="token budget"):
        eng.validate_lengths("d" * 100, "short text.")


def _streaming_engine(eos_token=-1, max_frames=48):
    from f5tts_tpu.engine.ar_engine import ParlerEngineConfig, ParlerTTSEngine
    from f5tts_tpu.models import parler as P

    t5 = P.T5Config(vocab=60, d_model=24, d_kv=6, d_ff=32, heads=4, layers=2,
                    rel_buckets=8, rel_max_dist=20)
    dec = P.ParlerDecoderConfig(vocab=40, codebooks=4, hidden=32, layers=2,
                                heads=4, ffn=48, cross_dim=24, prompt_vocab=60)
    dac = P.DacConfig(num_codebooks=4, codebook_size=40, codebook_dim=6,
                      latent_dim=24, decoder_dim=16, rates=(4, 2))
    kt, kd, kq = jax.random.split(jax.random.PRNGKey(0), 3)
    return ParlerTTSEngine(
        P.init_t5_encoder(kt, t5), t5,
        P.init_parler_decoder(kd, dec), dec,
        P.init_dac_decoder(kq, dac), dac,
        # tiny-DAC receptive field (rates 4,2; k=7 dilated residuals) is ~20
        # latent frames — margin 24 covers it
        ParlerEngineConfig(max_frames=max_frames, desc_pad=24, prompt_pad=24,
                           temperature=0.7, top_k=0, eos_token=eos_token,
                           compute_dtype="float32", batch_buckets=(1, 2),
                           stream_frames=8, stream_margin_frames=24),
        encode_fn=lambda s: [ord(c) % 60 for c in s],
    )


def test_parler_streaming_equals_batch():
    """Concatenated stream == the batch path, sample-for-sample (no EOS)."""
    eng = _streaming_engine()
    d, p = "a warm voice.", "hello streaming world."
    full = eng.synthesize_batch([d], [p], row_seeds=[7], strict_lengths=True)[0]
    chunks = list(eng.synthesize_streaming(d, p, seed=7))
    assert len(chunks) > 1, "expected incremental emission"
    stream = np.concatenate(chunks)
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=1e-5)


def test_parler_streaming_equals_batch_with_eos():
    """Early-EOS rows: the streamed tail reproduces the batch path's
    zeroed-past-EOS code context (window extension), so outputs stay equal."""
    base = _streaming_engine()
    d, p = "a calm voice.", "short utterance."
    # find a token the greedy-ish decode actually emits mid-stream in
    # codebook 0, and make THAT the EOS token for the real engines
    codes_probe = base.synthesize_batch([d], [p], row_seeds=[3], strict_lengths=True)
    # re-run at token level: use the decoded audio length as a no-EOS baseline
    assert len(codes_probe[0]) == (base.cfg.max_frames) * base.dac_cfg.hop

    found = None
    for cand in range(40):
        eng = _streaming_engine(eos_token=cand)
        wave = eng.synthesize_batch([d], [p], row_seeds=[3], strict_lengths=True)[0]
        n_frames = len(wave) // eng.dac_cfg.hop
        if 8 < n_frames < eng.cfg.max_frames:
            found = (cand, wave)
            break
    assert found is not None, "no candidate EOS token terminated mid-stream"
    cand, full = found
    eng = _streaming_engine(eos_token=cand)
    chunks = list(eng.synthesize_streaming(d, p, seed=3))
    stream = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    assert stream.shape == full.shape, (stream.shape, full.shape, cand)
    np.testing.assert_allclose(stream, full, atol=1e-5)


def test_parler_desc_cache_exactness_and_bound():
    """The style-description encoder cache: a warm batch (every description
    cached) runs the enc-input program (no T5) and must produce EXACTLY the
    cold batch's waves (enc round-trips bf16->f32->bf16 bit-identically);
    the cache is LRU-bounded."""
    from f5tts_tpu.engine.ar_engine import ParlerRow

    eng = _tiny_parler_engine(temperature=0.9, top_k=8)
    rows = [ParlerRow("calm voice.", f"utterance {i}.", seed=100 + i) for i in range(3)]
    cold = [w for w, _ in eng.synthesize_rows(rows)]
    assert eng.desc_cache_misses > 0 and eng.desc_cache_hits == 0
    warm = [w for w, _ in eng.synthesize_rows(rows)]
    assert eng.desc_cache_hits > 0
    for c, w in zip(cold, warm):
        np.testing.assert_array_equal(c, w)
    # the warm run compiled the enc-input variant
    assert any(k[-1] is True for k in eng._cache)

    # LRU bound: flood with distinct styles
    eng.desc_cache_max = 4
    for i in range(8):
        eng.synthesize_rows([ParlerRow(f"style {i}.", "hello.", seed=i)])
    assert len(eng._desc_cache) <= 4
