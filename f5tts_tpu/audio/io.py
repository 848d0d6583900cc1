"""WAV read/write on numpy float32 (no soundfile/pydub in this image).

Serving parity: the reference emits 24 kHz 16-bit WAV buffers and normalizes
int16 -> float32 / 32768 (``utils/tts_utils.py:60-64``).
"""

from __future__ import annotations

import io

import numpy as np
from scipy.io import wavfile


def read_wav(path_or_bytes) -> tuple[np.ndarray, int]:
    """Returns (mono float32 in [-1, 1], sample_rate). Accepts path or bytes."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        path_or_bytes = io.BytesIO(bytes(path_or_bytes))
    sr, data = wavfile.read(path_or_bytes)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    if audio.ndim == 2:  # channel-mean downmix (infer_batch_process, utils_infer.py:424-425)
        audio = audio.mean(axis=1)
    return audio, int(sr)


def write_wav(path, audio: np.ndarray, sample_rate: int = 24000, subtype: str = "int16") -> None:
    wavfile.write(path, sample_rate, _encode(audio, subtype))


def wav_bytes(audio: np.ndarray, sample_rate: int = 24000, subtype: str = "int16") -> bytes:
    buf = io.BytesIO()
    wavfile.write(buf, sample_rate, _encode(audio, subtype))
    return buf.getvalue()


def _encode(audio: np.ndarray, subtype: str):
    audio = np.asarray(audio, dtype=np.float32)
    if subtype == "int16":
        from f5tts_tpu.audio import native

        return native.encode_pcm16(audio)
    if subtype == "float32":
        return audio
    raise ValueError(f"unknown subtype {subtype!r}")
