"""Behavioral tests: chunking, duration heuristic, crossfade math, tokenizer,
ref-audio preprocessing, and an end-to-end engine smoke run (SURVEY §4.3)."""

import numpy as np
import pytest

import jax

from f5tts_tpu.audio.preprocess import clip_ref_audio, normalize_rms, resample
from f5tts_tpu.audio.stitch import crossfade_concat
from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.models.vocos import VocosConfig, init_vocos
from f5tts_tpu.ops.mel import MelConfig
from f5tts_tpu.sampling.euler import SamplerConfig
from f5tts_tpu.text.chunker import chunk_text, duration_frames, max_chars_for_ref
from f5tts_tpu.text.tokenizer import Tokenizer


def test_chunk_text_packing():
    text = "One two three. Four five six! Seven eight? Nine ten."
    chunks = chunk_text(text, max_chars=20)
    assert all(len(c.encode("utf-8")) <= 25 for c in chunks)
    assert " ".join(chunks).replace("  ", " ") .startswith("One two three.")
    # nothing lost
    joined = " ".join(chunks)
    for word in ["One", "six!", "eight?", "ten."]:
        assert word in joined
    # single short text -> one chunk
    assert chunk_text("Hi there.", max_chars=100) == ["Hi there."]


def test_chunk_text_packed_fills_budget():
    """Word-topoff packing (long-form throughput mode): every chunk but the
    last fills >= 85% of the byte budget (clause packing leaves ~8-38%
    unfilled on clause-quantized prose), and chunks reconstruct the input
    exactly modulo whitespace normalization."""
    from f5tts_tpu.text.chunker import chunk_text_packed

    text = ("The quick brown fox jumps over the lazy dog, while the sun sets "
            "behind the hills. A gentle breeze carried the scent of rain, and "
            "the fields shimmered in gold. Far away, a train whistled through "
            "the valley; its echo lingered for a while. Children ran along the "
            "river bank, laughing at the ducks that scattered before them. "
            "Night fell slowly over the quiet town. ") * 3
    chunks = chunk_text_packed(text, max_chars=135)
    fills = [len(c.encode("utf-8")) / 135 for c in chunks]
    assert all(f >= 0.85 for f in fills[:-1]), fills
    assert all(len(c.encode("utf-8")) <= 135 for c in chunks)
    norm = lambda s: " ".join(s.split())
    assert norm(" ".join(chunks)) == norm(text)
    # beats clause packing on chunk count for the same text
    assert len(chunks) <= len(chunk_text(text, max_chars=135))


def test_chunk_text_packed_cjk():
    """Unspaced CJK packs at char granularity and reconstructs exactly."""
    from f5tts_tpu.text.chunker import chunk_text_packed

    text = "这是一个很长的句子，它会继续下去。" * 8
    chunks = chunk_text_packed(text, max_chars=60)
    assert "".join(chunks) == text
    fills = [len(c.encode("utf-8")) / 60 for c in chunks]
    assert all(f >= 0.85 for f in fills[:-1]), fills


def test_chunk_text_packed_keeps_near_full_clause_boundaries():
    """A clause boundary landing within the top-off deficit closes the chunk
    there (crossfade on a natural pause) instead of splitting the next clause
    for a few bytes."""
    from f5tts_tpu.text.chunker import chunk_text_packed

    # each sentence is 60 bytes; budget 64 -> clause end lands at 94% > 92%
    s = "abcd efgh ijkl mnop qrst uvwx yzab cdef ghij klmn opqr stuv."
    chunks = chunk_text_packed(s + " " + s, max_chars=64, topoff_deficit=0.08)
    assert chunks == [s, s]


def test_duration_heuristic():
    # frames = ref_frames + ref_frames/ref_bytes * gen_bytes / speed (utils_infer.py:446-453)
    d = duration_frames(100, "abcd", "abcdabcd", speed=1.0)
    assert d == 100 + int(100 / 4 * 8)
    d2 = duration_frames(100, "abcd", "abcdabcd", speed=2.0)
    assert d2 < d
    assert duration_frames(100, "abcd", "x", fix_duration_secs=2.0) == int(2.0 * 24000 / 256)


def test_max_chars_for_ref():
    assert max_chars_for_ref("hello world.", 6.0) == int(12 / 6.0 * 19)


def test_crossfade_lengths():
    sr = 24000
    a = np.ones(sr, np.float32)
    b = np.ones(sr, np.float32) * 0.5
    out = crossfade_concat([a, b], 0.15, sr)
    n = int(0.15 * sr)
    assert len(out) == 2 * sr - n
    # crossfaded region is a linear blend
    assert abs(out[sr - n // 2] - 0.75) < 0.01
    # zero crossfade -> plain concat
    assert len(crossfade_concat([a, b], 0.0, sr)) == 2 * sr


def test_tokenizer_roundtrip():
    tok = Tokenizer.from_texts(["hello", "ನಮಸ್ಕಾರ"])
    ids = tok.encode(["hello", "hi"], pinyin=False)
    assert ids.shape[0] == 2
    assert (ids[1] == -1).sum() == ids.shape[1] - 2  # padded with -1
    assert tok.vocab_char_map[" "] == 0
    # unknown chars map to 0
    ids2 = tok.encode(["zzz"], pinyin=False)
    assert set(ids2[0][ids2[0] >= 0].tolist()) <= set(tok.vocab_char_map.values())


def test_clip_ref_audio():
    sr = 24000
    rng = np.random.default_rng(0)
    # 20 s of speech-like noise with a long silence at 8 s
    loud = (rng.standard_normal(sr * 20) * 0.3).astype(np.float32)
    loud[8 * sr : 10 * sr] = 0.0
    out = clip_ref_audio(loud, sr)
    assert len(out) <= 15 * sr + int(0.05 * sr)
    assert len(out) > sr  # kept something

    short = (rng.standard_normal(sr * 3) * 0.3).astype(np.float32)
    out2 = clip_ref_audio(short, sr)
    assert abs(len(out2) - (len(short) + int(0.05 * sr))) < sr // 2


def test_normalize_rms_and_resample():
    quiet = np.full(1000, 0.01, np.float32)
    boosted, rms = normalize_rms(quiet, 0.1)
    assert abs(float(np.sqrt(np.mean(boosted**2))) - 0.1) < 1e-3
    up = resample(np.ones(16000, np.float32), 16000, 24000)
    assert abs(len(up) - 24000) <= 2


@pytest.mark.slow
def test_engine_end_to_end_smoke():
    mel_cfg = MelConfig(n_mels=20)
    dit_cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
        text_num_embeds=200, text_dim=32, conv_layers=1, max_pos=512,
    )
    voc_cfg = VocosConfig(input_channels=20, dim=48, intermediate_dim=96, num_layers=2)
    engine = TTSEngine(
        init_dit(jax.random.PRNGKey(0), dit_cfg),
        dit_cfg,
        init_vocos(jax.random.PRNGKey(1), voc_cfg),
        Tokenizer.from_texts(["hello world this is a test of speech synthesis."]),
        EngineConfig(
            mel=mel_cfg, vocoder=voc_cfg,
            sampler=SamplerConfig(steps=2, cfg_strength=2.0),
            duration_buckets=(128, 256), batch_buckets=(1, 2, 4), text_pad=64,
            compute_dtype="float32",
        ),
    )
    rng = np.random.default_rng(2)
    ref = (rng.standard_normal(24000) * 0.1).astype(np.float32)  # 1 s ref
    wave, sr, mel = engine.synthesize("hello world. this is a test.", ref, 24000, "a ref text.", seed=3)
    assert sr == 24000
    assert wave.ndim == 1 and len(wave) > 1000
    assert np.all(np.isfinite(wave))
    assert mel.shape[1] == 20

    # determinism with a fixed seed
    wave2, _, _ = engine.synthesize("hello world. this is a test.", ref, 24000, "a ref text.", seed=3)
    np.testing.assert_allclose(wave, wave2, atol=1e-6)


# --- multi-style segment parsing (infer_gradio.py:317-499 / infer_cli.py:182-204)


def test_split_style_segments_basic():
    from f5tts_tpu.text.chunker import split_style_segments

    voices = ["default", "Happy", "sad"]
    segs = split_style_segments(
        "Hello there. {Happy} Great news! {Regular} Back to normal. [sad] oh no.",
        voices, default="default",
    )
    assert segs == [
        ("default", "Hello there."),
        ("Happy", "Great news!"),
        ("default", "Back to normal."),
        ("sad", "oh no."),
    ]


def test_split_style_segments_unknown_tag_left_verbatim():
    from f5tts_tpu.text.chunker import split_style_segments

    segs = split_style_segments("The [bracketed] word stays.", ["default"], default="default")
    assert segs == [("default", "The [bracketed] word stays.")]
    # case-insensitive resolution, consecutive same-voice runs merge
    segs = split_style_segments("{HAPPY} one. {happy} two.", ["Happy"], default="d")
    assert segs == [("Happy", "one. two.")]


def test_split_style_segments_tagless_and_empty():
    from f5tts_tpu.text.chunker import split_style_segments

    assert split_style_segments("plain text.", ["v"], default="v") == [("v", "plain text.")]
    assert split_style_segments("", ["v"], default="v") == [("v", "")]


def test_split_style_segments_hyphenated_voice():
    """Voice file stems may carry hyphens/dots; their tags must still switch
    (the web UI generates {stem} buttons straight from the voices dir)."""
    from f5tts_tpu.text.chunker import split_style_segments

    segs = split_style_segments(
        "hello there. {priya-hindi} namaste. {v2.5} hi again.",
        {"priya-hindi": 1, "v2.5": 1, "main": 1}, default="main")
    assert segs == [("main", "hello there."), ("priya-hindi", "namaste."),
                    ("v2.5", "hi again.")]


def test_chunk_frames_budget_caps_row_durations():
    """EngineConfig.chunk_frames_budget (long-form throughput knob): every
    planned row's total frames fit the requested bucket (the shipping default
    is 1024 — BENCH.md config #4); None keeps the reference's exact ~25 s
    speech-rate budget."""
    from f5tts_tpu.text.tokenizer import Tokenizer

    voc_cfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64, num_layers=2)
    tiny = DiTConfig(dim=64, depth=1, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
                     text_num_embeds=90, text_dim=32, conv_layers=1, max_pos=4096)

    def build(budget):
        return TTSEngine(
            init_dit(jax.random.PRNGKey(0), tiny), tiny,
            init_vocos(jax.random.PRNGKey(1), voc_cfg),
            Tokenizer({" ": 0, **{chr(i): i - 31 for i in range(33, 127)}}),
            EngineConfig(mel=MelConfig(n_mels=20), vocoder=voc_cfg,
                         sampler=SamplerConfig(steps=1), text_pad=512,
                         compute_dtype="float32", chunk_frames_budget=budget),
        )

    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(24000) * 0.1).astype(np.float32)  # 1 s ref
    paragraph = ("The quick brown fox jumps over the lazy dog near the river. " * 120)

    plan_ref = build(None).prepare_request(paragraph, ref, 24000, "a reference sentence.")
    plan_cap = build(1024).prepare_request(paragraph, ref, 24000, "a reference sentence.")

    assert max(r.duration for r in plan_cap.rows) <= 1024
    assert len(plan_cap.rows) > len(plan_ref.rows)  # shorter chunks -> more rows
    # same text covered (byte totals modulo whitespace)
    joined = lambda plan: "".join(r.text for r in plan.rows).replace(" ", "")
    ref_text_bytes = "areferencesentence."  # prepended per row
    assert joined(plan_cap).replace(ref_text_bytes, "") == joined(plan_ref).replace(ref_text_bytes, "")


def test_chunk_frames_budget_relaxes_for_long_refs():
    """A reference near/over the chunk_frames_budget (clip cap is 15 s ~ 1406
    frames vs the 1024 default) must NOT degenerate chunking to one clause per
    solve: the budget relaxes to the smallest duration bucket leaving at least
    min_chunk_gen_frames of generation room (ADVICE r2 high finding)."""
    from f5tts_tpu.text.tokenizer import Tokenizer

    voc_cfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64, num_layers=2)
    tiny = DiTConfig(dim=64, depth=1, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
                     text_num_embeds=90, text_dim=32, conv_layers=1, max_pos=4096)
    engine = TTSEngine(
        init_dit(jax.random.PRNGKey(0), tiny), tiny,
        init_vocos(jax.random.PRNGKey(1), voc_cfg),
        Tokenizer({" ": 0, **{chr(i): i - 31 for i in range(33, 127)}}),
        EngineConfig(mel=MelConfig(n_mels=20), vocoder=voc_cfg,
                     sampler=SamplerConfig(steps=1), text_pad=512,
                     compute_dtype="float32", chunk_frames_budget=1024),
    )
    rng = np.random.default_rng(0)
    paragraph = ("The quick brown fox jumps over the lazy dog, near the river bank. " * 60)
    # ~40 bytes/s speech rate, typical of the bundled demo voice
    for ref_secs in (12.0, 15.0):
        ref = (rng.standard_normal(int(ref_secs * 24000)) * 0.1).astype(np.float32)
        ref_text = "word " * int(ref_secs * 8)
        ref_frames = int(ref_secs * 24000) // 256  # 1125 / 1406 frames
        assert 1024 - ref_frames < engine.cfg.min_chunk_gen_frames  # the cliff case
        plan = engine.prepare_request(paragraph, ref, 24000, ref_text)
        # relaxed budget: chunks target the smallest workable bucket, so each
        # chunk carries a real amount of generated speech, not one clause
        gen_frames = [r.duration - r.ref_frames for r in plan.rows[:-1]]  # last may be short
        assert all(g >= engine.cfg.min_chunk_gen_frames // 2 for g in gen_frames), gen_frames
        # and far fewer solves than clauses (the degenerate mode was 1 clause/chunk)
        n_clauses = paragraph.count(",") + paragraph.count(".")
        assert len(plan.rows) < n_clauses / 3
        # rows still fit the model's max duration
        assert max(r.duration for r in plan.rows) <= engine.cfg.max_duration


def test_solve_batch_caps_normalized_to_buckets():
    """Non-bucket cap values would pad each capped group back up to a larger
    bucket (multiplying solve work) and diverge from warmup's compiled shapes
    — normalized at construction: caps snap DOWN to real batch buckets, caps
    for absent duration buckets drop (ADVICE r2)."""
    # cap 8 with batch_buckets=(32,): no bucket <= 8 -> snaps to the smallest
    assert EngineConfig(batch_buckets=(32,), solve_batch_caps=((1024, 8),)).solve_batch_caps == ((1024, 32),)
    # cap 12 snaps down to the 8 bucket
    assert EngineConfig(solve_batch_caps=((1024, 12),)).solve_batch_caps == ((1024, 8),)
    # absent duration buckets drop (custom-bucket configs keep only their own)
    assert EngineConfig(duration_buckets=(512, 2048), solve_batch_caps=((1024, 8),)).solve_batch_caps == ()
    assert EngineConfig(duration_buckets=(512, 2048)).solve_batch_caps == ((512, 16), (2048, 8))
    # the shipping default (the measured round-3 grid) is already normal
    assert EngineConfig().solve_batch_caps == (
        (512, 16), (768, 8), (1024, 8), (1536, 8), (2048, 8), (3072, 8), (4096, 8))
