"""AR-branch engine: batched autoregressive mel decoding + vocoder.

Minimal serving wrapper over ``models/ar.py`` (the Parler-class non-flow
branch, BASELINE config #3): encode text, run the KV-cache scan decode at a
static frame budget, trim by predicted stop lengths, vocode. Shares the
tokenizer and Vocos with the flow engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.models.ar import ARConfig, ar_generate
from f5tts_tpu.models.vocos import VocosConfig, vocos_decode
from f5tts_tpu.text.tokenizer import Tokenizer


@dataclass(frozen=True)
class AREngineConfig:
    vocoder: VocosConfig = field(default_factory=VocosConfig)
    text_pad: int = 256
    max_frames: int = 1024
    hop_length: int = 256
    sample_rate: int = 24000
    compute_dtype: str = "bfloat16"


class ARTTSEngine:
    def __init__(self, ar_params, ar_cfg: ARConfig, vocos_params, tokenizer: Tokenizer,
                 cfg: AREngineConfig = AREngineConfig()):
        self.ar_params = ar_params
        self.ar_cfg = ar_cfg
        self.vocos_params = vocos_params
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self._cache: dict = {}

    def _compiled(self, batch: int, max_frames: int):
        key = (batch, max_frames)
        if key in self._cache:
            return self._cache[key]

        def fn(ar_params, vocos_params, text):
            mel, lengths = ar_generate(
                self.ar_params if ar_params is None else ar_params,
                self.ar_cfg, text, max_frames, compute_dtype=self.compute_dtype,
            )
            mask = jnp.arange(max_frames)[None, :, None] < lengths[:, None, None]
            wave = vocos_decode(vocos_params, jnp.where(mask, mel, 0.0), self.cfg.vocoder,
                                compute_dtype=self.compute_dtype)
            return mel, lengths, wave

        self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def synthesize_batch(self, texts: list[str]) -> list[np.ndarray]:
        b = len(texts)
        ids = self.tokenizer.encode(texts, pad_to=self.cfg.text_pad)
        fn = self._compiled(b, self.cfg.max_frames)
        mel, lengths, wave = fn(self.ar_params, self.vocos_params, jnp.asarray(ids))
        wave = np.asarray(wave, np.float32)
        lengths = np.asarray(lengths)
        out = []
        for i in range(b):
            n_samples = max((int(lengths[i]) - 1) * self.cfg.hop_length, 0)
            out.append(wave[i, :n_samples])
        return out
