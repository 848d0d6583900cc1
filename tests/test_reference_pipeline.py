"""L2 pipeline goldens against the ACTUAL reference inference code.

Round-2 VERDICT missing #2: ``chunk_text``, the duration heuristic, the
crossfade-stitch math and ref-clipping were pinned by *invariant* tests only.
These tests import ``/root/reference/src/server/f5_tts/infer/utils_infer.py``
itself (via ``reference_runtime.load_reference_infer`` with faithfully-stubbed
pydub/vocos/torchaudio) and execute it:

- ``chunk_text`` (``utils_infer.py:61-88``) on multilingual inputs
- ``infer_process``'s speech-rate byte budget (``utils_infer.py:377``) and
  ``infer_batch_process``'s duration heuristic (``utils_infer.py:446-453``)
- ``infer_batch_process``'s RMS-normalize / slice / RMS-undo / crossfade
  stitch math (``utils_infer.py:427-519``) on synthetic waves, against the
  engine's host-side primitives
- ``preprocess_ref_audio_text``'s two-stage silence clipping
  (``utils_infer.py:287-318``) against ``audio.preprocess.clip_ref_audio``
"""

import numpy as np
import pytest
import torch

from reference_runtime import load_reference_infer

from f5tts_tpu.audio.preprocess import (
    clip_ref_audio,
    ensure_sentence_punctuation,
    normalize_rms,
)
from f5tts_tpu.audio.stitch import crossfade_concat
from f5tts_tpu.text.chunker import chunk_text, duration_frames, max_chars_for_ref

SR = 24_000
HOP = 256

MULTILINGUAL = [
    "The quick brown fox jumps over the lazy dog. It was the best of times, "
    "it was the worst of times; an age of wisdom, an age of foolishness!",
    # Devanagari (Hindi): ASCII danda-free prose with western punctuation
    "नमस्ते दुनिया, आप कैसे हैं? मैं ठीक हूँ. आज मौसम बहुत अच्छा है, चलो बाहर चलते हैं!",
    # Kannada
    "ನಮಸ್ಕಾರ ಜಗತ್ತು. ನೀವು ಹೇಗಿದ್ದೀರಿ? ಇಂದು ಹವಾಮಾನ ತುಂಬಾ ಚೆನ್ನಾಗಿದೆ, ಹೊರಗೆ ಹೋಗೋಣ!",
    # Chinese with fullwidth punctuation (the regex's second alternative)
    "你好世界。今天天气很好，我们出去走走吧！你吃饭了吗？",
    # mixed scripts + digits
    "Meeting at 10:30, then चाय break. ಆನಂತರ work! Done?",
]


@pytest.fixture(scope="module")
def ref_infer():
    return load_reference_infer()


def test_chunk_text_golden_multilingual(ref_infer):
    """Ours == the reference's actual chunk_text, byte budget by byte budget."""
    for text in MULTILINGUAL:
        for max_chars in (12, 25, 60, 135, 10_000):
            assert chunk_text(text, max_chars) == ref_infer.chunk_text(text, max_chars), (
                text, max_chars)


class _RecordingModel:
    """Stands in for CFM: records sample() calls, returns deterministic mel."""

    def __init__(self, mel_dim=100):
        self.mel_dim = mel_dim
        self.calls = []

    @staticmethod
    def mel_for(duration, mel_dim=100) -> np.ndarray:
        rng = np.random.default_rng(duration)  # keyed by duration: replayable
        return rng.standard_normal((duration, mel_dim)).astype(np.float32)

    def sample(self, cond, text, duration, steps, cfg_strength, sway_sampling_coef):
        self.calls.append({
            "duration": int(duration), "text": text, "steps": steps,
            "cfg_strength": cfg_strength, "sway": sway_sampling_coef,
            "cond_rms": float(torch.sqrt(torch.mean(torch.square(cond)))),
        })
        out = torch.from_numpy(self.mel_for(int(duration), self.mel_dim))[None]
        return out, None


class _FakeVocoder:
    """mel (b, mel, n) -> wave (b, n*HOP), deterministic + replayable."""

    @staticmethod
    def vocode_np(mel_frames_first: np.ndarray) -> np.ndarray:
        # (n, mel) -> (n*HOP,): each frame paints its mean over a hop
        return np.repeat(mel_frames_first.mean(axis=-1), HOP).astype(np.float32)

    def decode(self, mel):
        wav = self.vocode_np(np.asarray(mel[0]).T)
        return torch.from_numpy(wav)[None]


def _ref_wav(secs=2.0, amp=0.2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(secs * SR)) / SR
    wav = amp * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.standard_normal(len(t))
    return wav.astype(np.float32)


@pytest.mark.parametrize("amp", [0.25, 0.05])  # loud ref (no boost) and quiet ref (RMS boost+undo)
def test_infer_batch_process_golden(ref_infer, tmp_path, amp):
    """Execute the reference's actual per-chunk loop + crossfade stitch with a
    recording fake model/vocoder; replay the identical generation math through
    OUR host-side primitives and compare the final stitched wave exactly."""
    ref_text = "a reference sentence spoken by the voice."
    gen_text = ("First sentence of the prompt, with a clause. Second one follows! "
                "Third sentence here? Fourth, to force several chunks.")
    wav = _ref_wav(2.0, amp=amp)
    audio_t = torch.from_numpy(wav)[None]

    model = _RecordingModel()
    voc = _FakeVocoder()
    # small max_chars so several chunks/crossfades happen
    chunks = ref_infer.chunk_text(gen_text, max_chars=40)
    final_wave, out_sr, combined_mel = ref_infer.infer_batch_process(
        (audio_t, SR), ref_text, chunks, model, voc,
        mel_spec_type="vocos", cross_fade_duration=0.15, nfe_step=32,
        cfg_strength=2.0, sway_sampling_coef=-1.0, speed=1.0, device="cpu",
    )
    assert out_sr == SR

    # ---- our replay of the same pipeline (engine host-side math) ----
    ours_chunks = chunk_text(gen_text, max_chars=40)
    assert ours_chunks == chunks
    audio_norm, rms = normalize_rms(wav, 0.1)
    ref_sp = ref_text + " " if len(ref_text[-1].encode("utf-8")) == 1 else ref_text
    ref_frames = len(audio_norm) // HOP
    waves, mels = [], []
    for i, c in enumerate(ours_chunks):
        dur = duration_frames(ref_frames, ref_sp, c, speed=1.0)
        # the reference model saw the whole-utterance text and duration
        assert model.calls[i]["duration"] == dur
        assert model.calls[i]["text"] == [list(ref_sp + c)]  # pinyin passthrough = chars
        gen = _RecordingModel.mel_for(dur)[ref_frames:]
        w = _FakeVocoder.vocode_np(gen)
        if rms < 0.1:
            w = w * rms / 0.1
        waves.append(w)
        mels.append(gen)
    ours = crossfade_concat(waves, 0.15, SR)

    assert final_wave.shape == ours.shape
    np.testing.assert_allclose(final_wave, ours, atol=1e-6)
    np.testing.assert_allclose(
        combined_mel, np.concatenate(mels, axis=0).T, atol=1e-6)


def test_infer_process_byte_budget_golden(ref_infer, tmp_path):
    """infer_process derives max_chars from the ref speech rate
    (``utils_infer.py:377``); executing it must chunk exactly like our
    ``max_chars_for_ref`` + ``chunk_text``."""
    from reference_runtime import AudioSegment

    ref_text = "this reference sentence runs for about four seconds total. "
    gen_text = MULTILINGUAL[0] + " " + MULTILINGUAL[1]
    wav = _ref_wav(4.0, amp=0.2, seed=3)
    path = tmp_path / "ref.wav"
    AudioSegment((wav * 32768).astype(np.int16), SR).export(path)

    model = _RecordingModel()
    ref_infer.infer_process(
        str(path), ref_text, gen_text, model, _FakeVocoder(),
        mel_spec_type="vocos", cross_fade_duration=0.15, device="cpu")

    # the wav round-trips through int16; reproduce the loaded view
    loaded = (wav * 32768).astype(np.int16).astype(np.float32) / 32768.0
    secs = len(loaded) / SR
    ours_chunks = chunk_text(gen_text, max_chars_for_ref(ref_text, secs))
    from f5tts_tpu.text.tokenizer import convert_char_to_pinyin

    got_texts = [c["text"][0] for c in model.calls]
    # the reference appends a space whenever the last char is 1-byte — even
    # if it already IS a space (utils_infer.py:439-440); our engine mirrors
    want_ref = ref_text + " " if len(ref_text[-1].encode("utf-8")) == 1 else ref_text
    # compare through OUR text front-end (incl. the reference's OOV
    # translation ';'->',' and curly->straight quotes, utils.py:143-145)
    assert got_texts == [convert_char_to_pinyin([want_ref + c])[0] for c in ours_chunks]
    # duration heuristic per chunk
    loaded_norm, _ = normalize_rms(loaded, 0.1)
    ref_frames = len(loaded_norm) // HOP
    for call, c in zip(model.calls, ours_chunks):
        assert call["duration"] == duration_frames(ref_frames, want_ref, c, speed=1.0)


def _speechlike(total_secs, voiced_spans, sr=SR, amp=0.3, seed=1):
    """Synthetic speech-like wav: 220 Hz tone over the given (start, end) sec
    spans, digital silence elsewhere (clear dB margins for both detectors)."""
    rng = np.random.default_rng(seed)
    wav = np.zeros(int(total_secs * sr), np.float32)
    t = np.arange(len(wav)) / sr
    for s, e in voiced_spans:
        i, j = int(s * sr), int(e * sr)
        wav[i:j] = amp * np.sin(2 * np.pi * 220 * t[i:j]) + 0.02 * rng.standard_normal(j - i)
    return wav


CLIP_CASES = {
    # long silences -> stage-1 clip collects leading segments up to 15 s
    "stage1": (22.0, [(0.0, 4.0), (6.0, 10.0), (12.5, 16.0), (18.0, 21.0)]),
    # only short (~0.4 s) gaps -> stage 1 finds one huge segment, stage 2 clips
    "stage2": (20.0, [(i * 1.2, i * 1.2 + 0.8) for i in range(16)]),
    # continuous tone -> hard cut at 15 s (stage 3)
    "stage3": (18.0, [(0.0, 18.0)]),
    # short clip -> untouched except edge trim + 50 ms pad
    "short": (6.0, [(0.2, 5.6)]),
}


@pytest.mark.parametrize("case", sorted(CLIP_CASES))
def test_preprocess_ref_clipping_golden(ref_infer, tmp_path, case):
    """Run the reference's ACTUAL preprocess_ref_audio_text (through the
    faithful pydub stub) and our clip_ref_audio on the same audio: identical
    clip decisions and sample-identical output (int16 quantization aside)."""
    total, spans = CLIP_CASES[case]
    wav = _speechlike(total, spans)
    q = (wav * 32768).clip(-32768, 32767).astype(np.int16)
    from reference_runtime import AudioSegment

    path = tmp_path / f"{case}.wav"
    AudioSegment(q, SR).export(path)

    out_path, out_text = ref_infer.preprocess_ref_audio_text(str(path), "some ref text", clip_short=True)
    ref_clipped = AudioSegment.from_file(out_path).numpy()

    ours = clip_ref_audio(q.astype(np.float32) / 32768.0, SR)
    assert len(ours) / SR <= 15.06  # 15 s + 50 ms pad tolerance
    assert abs(len(ours) - len(ref_clipped)) <= 2, (
        f"{case}: ours {len(ours)/SR:.3f}s vs reference {len(ref_clipped)/SR:.3f}s")
    m = min(len(ours), len(ref_clipped))
    np.testing.assert_allclose(ours[:m], ref_clipped[:m], atol=2 / 32768.0)

    # terminal-punctuation contract rides along (utils_infer.py:343-347)
    assert out_text == ensure_sentence_punctuation("some ref text")
