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
