"""Streaming synthesis: concatenated yields == the non-streaming waveform."""

import numpy as np

import jax

from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.models.vocos import VocosConfig, init_vocos
from f5tts_tpu.ops.mel import MelConfig
from f5tts_tpu.sampling.euler import SamplerConfig
from f5tts_tpu.text.tokenizer import Tokenizer


def _engine():
    mel_cfg = MelConfig(n_mels=20)
    dit_cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
        text_num_embeds=200, text_dim=32, conv_layers=1, max_pos=512,
    )
    voc_cfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64, num_layers=2)
    return TTSEngine(
        init_dit(jax.random.PRNGKey(0), dit_cfg), dit_cfg,
        init_vocos(jax.random.PRNGKey(1), voc_cfg),
        Tokenizer.from_texts(["hello world this is a long test of streaming speech synthesis."]),
        EngineConfig(
            mel=mel_cfg, vocoder=voc_cfg, sampler=SamplerConfig(steps=2),
            duration_buckets=(128, 256), batch_buckets=(1, 2, 4), text_pad=64,
            compute_dtype="float32",
        ),
    )


def test_streaming_equals_batch():
    engine = _engine()
    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    text = " ".join(f"this is sentence number {i} of the long streaming test." for i in range(12))

    full, sr, _ = engine.synthesize(text, ref, 24000, "a ref.", seed=9)
    segs = list(engine.synthesize_streaming(text, ref, 24000, "a ref.", seed=9))
    assert len(segs) >= 2  # actually streamed in pieces
    streamed = np.concatenate(segs)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_streaming_single_chunk():
    engine = _engine()
    rng = np.random.default_rng(1)
    ref = (rng.standard_normal(12000) * 0.1).astype(np.float32)
    segs = list(engine.synthesize_streaming("short.", ref, 24000, "a ref.", seed=3))
    full, _, _ = engine.synthesize("short.", ref, 24000, "a ref.", seed=3)
    np.testing.assert_allclose(np.concatenate(segs), full, atol=1e-5)
