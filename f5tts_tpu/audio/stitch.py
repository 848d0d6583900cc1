"""Crossfade stitching of per-chunk waveforms (``utils_infer.py:484-519``).

Runs through the native C++ ops (``f5tts_tpu.audio.native``) when the shared
library is available; numpy otherwise — identical output either way.
"""

from __future__ import annotations

import numpy as np

from f5tts_tpu.audio import native


def crossfade_concat(waves: list[np.ndarray], cross_fade_duration: float = 0.15, sample_rate: int = 24000) -> np.ndarray:
    if not waves:
        return np.zeros(0, dtype=np.float32)
    if cross_fade_duration <= 0:
        return np.concatenate(waves)
    final = np.asarray(waves[0], np.float32)
    n = int(cross_fade_duration * sample_rate)
    for nxt in waves[1:]:
        final = native.crossfade_pair(final, np.asarray(nxt, np.float32), n)
    return final
