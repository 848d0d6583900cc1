"""Serving engine: bucketed AOT compilation, batched chunk synthesis, continuous batching."""

from f5tts_tpu.engine.engine import EngineConfig, TTSEngine  # noqa: F401
