"""Reference-audio preprocessing: silence clipping, edge trim, RMS norm, resample.

Numpy re-implementation of the reference's pydub-based pipeline
(``infer/utils_infer.py:263-351``): split on silence with two threshold stages
to clip the reference to <= 15 s, trim edge silence, append 50 ms of silence,
then (at synthesis time, ``utils_infer.py:423-433``) mono-downmix, RMS-normalize
quiet refs up to 0.1, and resample to 24 kHz.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import resample_poly

TARGET_RMS = 0.1
TARGET_SR = 24_000


def rms_dbfs(x: np.ndarray) -> float:
    """pydub-style dBFS for float audio in [-1, 1] (max-possible-amp ref = 1)."""
    rms = float(np.sqrt(np.mean(np.square(x)))) if x.size else 0.0
    if rms <= 0:
        return -np.inf
    return 20.0 * np.log10(rms)


def _frame_dbfs(audio: np.ndarray, sr: int, win_ms: int = 10) -> np.ndarray:
    win = max(int(sr * win_ms / 1000), 1)
    n = len(audio) // win
    if n == 0:
        return np.array([rms_dbfs(audio)])
    frames = audio[: n * win].reshape(n, win)
    rms = np.sqrt(np.mean(np.square(frames), axis=1))
    with np.errstate(divide="ignore"):
        return 20.0 * np.log10(np.maximum(rms, 1e-12))


def detect_nonsilent(audio: np.ndarray, sr: int, min_silence_ms: int, thresh_db: float, seek_ms: int = 10):
    """(start, end) sample ranges of non-silent spans (pydub.silence semantics)."""
    db = _frame_dbfs(audio, sr, seek_ms)
    step = int(sr * seek_ms / 1000)
    silent = db < thresh_db
    spans = []
    start = None
    min_frames = max(min_silence_ms // seek_ms, 1)
    i = 0
    n = len(silent)
    while i < n:
        if not silent[i]:
            if start is None:
                start = i
            i += 1
        else:
            j = i
            while j < n and silent[j]:
                j += 1
            if start is not None and (j - i) >= min_frames:
                spans.append((start * step, i * step))
                start = None
            elif start is None:
                pass
            i = j
    if start is not None:
        spans.append((start * step, len(audio)))
    return spans


def split_on_silence(audio: np.ndarray, sr: int, min_silence_ms: int, thresh_db: float, keep_silence_ms: int):
    keep = int(sr * keep_silence_ms / 1000)
    segs = []
    for s, e in detect_nonsilent(audio, sr, min_silence_ms, thresh_db):
        segs.append(audio[max(0, s - keep) : min(len(audio), e + keep)])
    return segs


def remove_silence_edges(audio: np.ndarray, sr: int, thresh_db: float = -42.0) -> np.ndarray:
    """Trim leading/trailing silence (``utils_infer.py:263-276``)."""
    db = _frame_dbfs(audio, sr, 1)
    step = max(int(sr / 1000), 1)
    voiced = np.nonzero(db > thresh_db)[0]
    if voiced.size == 0:
        return audio[:0]
    start = voiced[0] * step
    end = min((voiced[-1] + 1) * step, len(audio))
    return audio[start:end]


def clip_ref_audio(audio: np.ndarray, sr: int, max_ms: int = 15000) -> np.ndarray:
    """Two-stage silence-aware clip to <= 15 s + edge trim + 50 ms pad
    (``utils_infer.py:287-318``)."""

    def assemble(segs):
        out = np.zeros(0, dtype=audio.dtype)
        for seg in segs:
            if len(out) > 6000 * sr // 1000 and (len(out) + len(seg)) > max_ms * sr // 1000:
                break
            out = np.concatenate([out, seg])
        return out

    clipped = assemble(split_on_silence(audio, sr, 1000, -50.0, 1000))
    if len(clipped) > max_ms * sr // 1000:
        clipped = assemble(split_on_silence(audio, sr, 100, -40.0, 1000))
    if len(clipped) > max_ms * sr // 1000 or len(clipped) == 0:
        clipped = (clipped if len(clipped) else audio)[: max_ms * sr // 1000]
    clipped = remove_silence_edges(clipped, sr)
    return np.concatenate([clipped, np.zeros(int(sr * 0.05), dtype=audio.dtype)])


def remove_long_silences(audio: np.ndarray, sr: int, min_silence_ms: int = 1000,
                         thresh_db: float = -50.0, keep_silence_ms: int = 500) -> np.ndarray:
    """Collapse long internal silences (``utils_infer.py:530-539``:
    remove_silence_for_generated_wav semantics — split on silence, re-concat)."""
    segs = split_on_silence(audio, sr, min_silence_ms, thresh_db, keep_silence_ms)
    if not segs:
        return audio[:0]
    return np.concatenate(segs)


def save_spectrogram(mel: np.ndarray, path: str) -> None:
    """Mel (frames, n_mels) -> PNG (``utils_infer.py:545-550`` parity)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(12, 4))
    plt.imshow(mel.T, origin="lower", aspect="auto")
    plt.colorbar()
    plt.savefig(path)
    plt.close()


def resample(audio: np.ndarray, sr: int, target_sr: int = TARGET_SR) -> np.ndarray:
    if sr == target_sr:
        return audio
    g = np.gcd(sr, target_sr)
    return resample_poly(audio, target_sr // g, sr // g).astype(np.float32)


def normalize_rms(audio: np.ndarray, target_rms: float = TARGET_RMS) -> tuple[np.ndarray, float]:
    """Boost quiet refs to target RMS; returns (audio, original rms).

    The gain is undone on the generated wave when the ref was quiet
    (``utils_infer.py:427-429,475-476``).
    """
    rms = float(np.sqrt(np.mean(np.square(audio)))) if audio.size else 0.0
    if 0 < rms < target_rms:
        audio = audio * (target_rms / rms)
    return audio.astype(np.float32), rms


def ensure_sentence_punctuation(text: str) -> str:
    """``utils_infer.py:343-347``."""
    if not text.endswith(". ") and not text.endswith("。"):
        if text.endswith("."):
            text += " "
        else:
            text += ". "
    return text
