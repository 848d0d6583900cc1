"""Sentence-aware text chunking for long-form synthesis.

Parity with ``infer/utils_infer.py:61-88`` (greedy byte-budget packing over a
punctuation split) and the speech-rate-aware budget
``max_chars = ref_bytes / ref_sec * (25 - ref_sec)``
(``utils_infer.py:377``).
"""

from __future__ import annotations

import re

_SPLIT = re.compile(r"(?<=[;:,.!?])\s+|(?<=[；：，。！？])")


def chunk_text(text: str, max_chars: int = 135) -> list[str]:
    chunks: list[str] = []
    current = ""
    for sentence in _SPLIT.split(text):
        sep = " " if sentence and len(sentence[-1].encode("utf-8")) == 1 else ""
        if len(current.encode("utf-8")) + len(sentence.encode("utf-8")) <= max_chars:
            current += sentence + sep
        else:
            if current:
                chunks.append(current.strip())
            current = sentence + sep
    if current:
        chunks.append(current.strip())
    return chunks


def max_chars_for_ref(ref_text: str, ref_audio_secs: float) -> int:
    """Byte budget per chunk derived from the reference speech rate."""
    return int(len(ref_text.encode("utf-8")) / max(ref_audio_secs, 1e-6) * (25 - ref_audio_secs))


def duration_frames(
    ref_frames: int, ref_text: str, gen_text: str, speed: float = 1.0, fix_duration_secs: float | None = None,
    sample_rate: int = 24000, hop_length: int = 256,
) -> int:
    """Total mel frames (ref + generated) — ``utils_infer.py:446-453``."""
    if fix_duration_secs is not None:
        return int(fix_duration_secs * sample_rate / hop_length)
    ref_bytes = max(len(ref_text.encode("utf-8")), 1)
    gen_bytes = len(gen_text.encode("utf-8"))
    return ref_frames + int(ref_frames / ref_bytes * gen_bytes / speed)
