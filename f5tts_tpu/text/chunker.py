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


_STYLE_TAG = re.compile(r"\{([\w.-]+)\}|\[([\w.-]+)\]")  # voice stems may carry - or .


def split_style_segments(
    text: str, known_voices, default: str = "main"
) -> list[tuple[str, str]]:
    """``(voice, text)`` runs from ``{Style}`` tags (the reference gradio
    multi-style contract, ``infer/infer_gradio.py:317-499``) or ``[voice]``
    tags (``infer/infer_cli.py:182-204``).

    Safer-than-reference twist: a tag only switches style when its name
    resolves (case-insensitively) to a known voice or the literal
    ``regular`` (gradio's name for the main voice); otherwise the bracketed
    text is left verbatim, so ordinary texts containing ``[word]`` are not
    mangled. Untagged leading text uses ``default``.
    """
    lookup = {v.lower(): v for v in known_voices}
    segments: list[tuple[str, str]] = []
    pos = 0
    cur = default

    def emit(upto: int):
        seg = text[pos:upto]
        if seg.strip():
            if segments and segments[-1][0] == cur:
                segments[-1] = (cur, segments[-1][1] + " " + seg.strip())
            else:
                segments.append((cur, seg.strip()))

    for m in _STYLE_TAG.finditer(text):
        name = (m.group(1) or m.group(2)).lower()
        resolved = default if name == "regular" else lookup.get(name)
        if resolved is None:
            continue  # not a voice tag: keep the bracketed text as content
        emit(m.start())
        cur = resolved
        pos = m.end()
    emit(len(text))
    if not segments:
        segments.append((default, text.strip() or text))
    return segments
