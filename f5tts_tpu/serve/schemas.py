"""Request/response schemas (pydantic), parity with ``models/schemas.py:6-43``."""

from __future__ import annotations

from pydantic import BaseModel, Field, field_validator

from f5tts_tpu.utils.config import SUPPORTED_LANGUAGES


class SpeechRequest(BaseModel):
    """POST /v1/audio/speech body.

    ``text`` matches the reference's KannadaSynthesizeRequest; ``input`` is
    accepted as an OpenAI-style alias. Optional voice-cloning fields extend the
    reference (which hardcodes one Kannada voice, ``routes/speech.py:26``).
    """

    text: str = ""
    input: str = ""
    voice: str | None = None  # named voice from the voices dir
    description: str | None = None  # style description (Parler AR branch)
    ref_text: str | None = None
    language: str | None = None
    speed: float = Field(default=1.0, ge=0.3, le=3.0)
    # model evals per guidance branch (reference nfe_step knob); None = the
    # server's configured default (the certified ralston recipe, BENCH.md)
    nfe_step: int | None = Field(default=None, ge=1, le=128)
    cfg_strength: float = Field(default=2.0, ge=0.0, le=10.0)
    seed: int | None = None
    response_format: str = "wav"
    # "strict": solve with the embedded error estimate and auto-escalate to
    # the exact reference recipe (euler-32) when it exceeds the calibrated
    # threshold — detected, costed fallback for sharp flow fields
    quality: str = "default"

    @field_validator("quality")
    @classmethod
    def _quality(cls, v):
        if v not in ("default", "strict"):
            raise ValueError("quality must be 'default' or 'strict'")
        return v

    @field_validator("text", "input")
    @classmethod
    def _max_len(cls, v: str) -> str:
        if len(v) > 100_000:  # prompt length cap, schemas.py:10
            raise ValueError("text must be <= 100k characters")
        return v

    @field_validator("language")
    @classmethod
    def _lang(cls, v):
        if v is not None and v not in SUPPORTED_LANGUAGES:
            raise ValueError(f"unsupported language {v!r}")
        return v

    @property
    def effective_text(self) -> str:
        return self.text or self.input


class TranscribeResponse(BaseModel):
    text: str


class HealthResponse(BaseModel):
    status: str = "healthy"
    model: str = ""
    device: str = ""
    batches: int = 0
    rows: int = 0
