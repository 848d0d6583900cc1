"""Edge cases across the host/numeric layers."""

import numpy as np

import jax.numpy as jnp

from f5tts_tpu.audio.stitch import crossfade_concat
from f5tts_tpu.ops.mel import MelConfig, log_mel_spectrogram
from f5tts_tpu.text.chunker import chunk_text
from f5tts_tpu.text.tokenizer import Tokenizer


def test_mel_one_dim_and_short_input():
    cfg = MelConfig(n_mels=20)
    wav = np.random.default_rng(0).standard_normal(2048).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(wav), cfg)  # 1-D input promoted to batch
    assert mel.shape == (1, 1 + 2048 // 256, 20)
    # shorter than one hop still yields the centered frame
    mel2 = log_mel_spectrogram(jnp.asarray(wav[:200]), cfg)
    assert mel2.shape[1] >= 1


def test_chunker_no_punctuation_and_unicode():
    # a single unbroken run longer than the budget stays one chunk (the
    # splitter only breaks at punctuation, like the reference)
    text = "word " * 50
    chunks = chunk_text(text.strip(), max_chars=40)
    assert len(chunks) == 1
    # multibyte scripts budget by UTF-8 bytes
    kn = "ನಮಸ್ಕಾರ. " * 10
    chunks = chunk_text(kn.strip(), max_chars=60)
    assert all(len(c.encode("utf-8")) <= 60 + 25 for c in chunks)
    assert len(chunks) > 1


def test_tokenizer_empty_and_whitespace():
    tok = Tokenizer.from_texts(["abc"])
    ids = tok.encode([""], pinyin=False)
    assert ids.shape[1] >= 1 and (ids == -1).all()
    ids2 = tok.encode(["   "], pinyin=False)
    assert (ids2[0][:3] == 0).all()  # spaces are id 0


def test_crossfade_single_and_empty():
    assert len(crossfade_concat([], 0.15)) == 0
    one = np.ones(100, np.float32)
    np.testing.assert_array_equal(crossfade_concat([one], 0.15), one)
    # crossfade longer than both clips degrades gracefully
    out = crossfade_concat([np.ones(10, np.float32), np.ones(10, np.float32)], 1.0, 24000)
    assert len(out) == 10
