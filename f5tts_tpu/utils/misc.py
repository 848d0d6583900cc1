"""Misc host utilities (parity with ``src/server/utils/``)."""

from __future__ import annotations

import datetime
import os

import numpy as np


def load_audio(source: str) -> tuple[np.ndarray, int]:
    """Reference-voice loader. The reference downloads the ref WAV from a URL
    on *every request* (``utils/tts_utils.py:54``, ``utils/audio_utils.py``);
    this build is zero-egress, so sources are local paths (or file:// URLs),
    and callers cache."""
    from f5tts_tpu.audio.io import read_wav

    if source.startswith("file://"):
        source = source[len("file://") :]
    if source.startswith(("http://", "https://")):
        raise ValueError("remote voice URLs are not supported in this zero-egress build; use a local path")
    if not os.path.exists(source):
        raise FileNotFoundError(source)
    return read_wav(source)


_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine", "ten",
         "eleven", "twelve", "thirteen", "fourteen", "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty"]


def _number_words(n: int) -> str:
    if n < 20:
        return _ONES[n]
    tens, ones = divmod(n, 10)
    return _TENS[tens] + ("" if ones == 0 else " " + _ONES[ones])


def time_to_words(now: datetime.datetime | None = None) -> str:
    """Current IST time as words (``utils/time_utils.py:6-21`` behavior:
    'HH o'clock' on the hour, else 'HH MM')."""
    ist = datetime.timezone(datetime.timedelta(hours=5, minutes=30))
    now = now.astimezone(ist) if now else datetime.datetime.now(ist)
    hour = now.hour % 12 or 12
    if now.minute == 0:
        return f"{_number_words(hour)} o'clock"
    return f"{_number_words(hour)} {_number_words(now.minute)}"


def describe_device() -> dict:
    import jax

    devs = jax.devices()
    return {"platform": jax.default_backend(), "devices": len(devs), "kind": devs[0].device_kind if devs else "none"}
