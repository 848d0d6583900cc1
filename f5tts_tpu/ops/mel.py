"""Log-mel spectrogram front-end (24 kHz / 100 mel / hop 256 family).

Capability parity with the reference's two mel flavors
(``src/server/f5_tts/model/modules.py:30-101``):

- ``vocos`` flavor: torchaudio-style ``MelSpectrogram`` with ``power=1``,
  ``center=True`` (reflect pad), HTK mel scale, no filterbank norm, then
  ``log(clamp(mel, 1e-5))``.
- ``bigvgan`` flavor: manual reflect pad of ``(n_fft - hop)//2``, ``center=False``
  STFT, magnitude ``sqrt(re^2 + im^2 + 1e-9)``, librosa Slaney-scale filterbank
  with Slaney area norm, then the same log-clamp.

TPU-first design notes: the STFT is expressed as framing + rFFT (XLA lowers FFT
natively on TPU) and the mel projection is a single (freq x mel) matmul that XLA
fuses with the magnitude computation and feeds to the MXU. Filterbanks are
precomputed host-side in numpy and closed over as constants. Unlike the
reference (which returns ``(b, n_mels, frames)`` and permutes at every call
site, ``model/cfm.py:104-105``), all APIs here are frame-major ``(b, frames,
n_mels)`` — the natural layout for sequence models.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 24_000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 100
    fmin: float = 0.0
    fmax: float | None = None  # None -> sr / 2
    flavor: str = "vocos"  # "vocos" (HTK/torchaudio) | "bigvgan" (Slaney/librosa)

    @property
    def frames_per_second(self) -> float:
        return self.sample_rate / self.hop_length


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches ``torch.hann_window(periodic=True)``)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


# ---------------------------------------------------------------------------
# Mel filterbanks (host-side numpy; both scales implemented from the formulas)
# ---------------------------------------------------------------------------


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    log_region = m >= min_log_mel
    f = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    scale: str = "htk",
    norm: str | None = None,
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, shape ``(n_freqs, n_mels)``.

    ``scale='htk', norm=None`` reproduces torchaudio's default
    (the reference's vocos mel path); ``scale='slaney', norm='slaney'``
    reproduces ``librosa.filters.mel`` defaults (the bigvgan path).
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)

    if scale == "htk":
        to_mel, to_hz = _hz_to_mel_htk, _mel_to_hz_htk
    elif scale == "slaney":
        to_mel, to_hz = _hz_to_mel_slaney, _mel_to_hz_slaney
    else:
        raise ValueError(f"unknown mel scale {scale!r}")

    m_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    f_pts = to_hz(m_pts)

    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[np.newaxis, :] - all_freqs[:, np.newaxis]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[np.newaxis, :]
    elif norm is not None:
        raise ValueError(f"unknown filterbank norm {norm!r}")

    return fb.astype(dtype)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------


def frame_signal(wav: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice ``(..., samples)`` into overlapping frames ``(..., n_frames, frame_length)``."""
    n = wav.shape[-1]
    n_frames = 1 + (n - frame_length) // hop
    idx = np.arange(frame_length)[None, :] + hop * np.arange(n_frames)[:, None]
    return wav[..., idx]


def stft_magnitude(
    wav: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool,
    magnitude_eps: float = 0.0,
) -> jnp.ndarray:
    """|STFT| of ``(b, samples)`` -> ``(b, n_frames, n_fft//2 + 1)``.

    ``center=True`` reflect-pads ``n_fft//2`` on both sides (torch.stft default
    pad mode when centered).
    """
    window = jnp.asarray(hann_window(win_length), dtype=wav.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(wav, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if magnitude_eps:
        return jnp.sqrt(power + magnitude_eps)
    return jnp.sqrt(jnp.maximum(power, 0.0))


@functools.partial(jax.jit, static_argnames=("cfg",))
def log_mel_spectrogram(wav: jnp.ndarray, cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """Waveform ``(b, samples)`` -> log-mel ``(b, n_frames, n_mels)``.

    Matches the reference's flavor-dependent padding/magnitude/filterbank
    behavior (``modules.py:30-101``); output is frame-major.
    """
    if wav.ndim == 1:
        wav = wav[None]
    if cfg.flavor == "vocos":
        mag = stft_magnitude(wav, cfg.n_fft, cfg.hop_length, cfg.win_length, center=True)
        fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, scale="htk", norm=None)
    elif cfg.flavor == "bigvgan":
        pad = (cfg.n_fft - cfg.hop_length) // 2
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
        mag = stft_magnitude(wav, cfg.n_fft, cfg.hop_length, cfg.win_length, center=False, magnitude_eps=1e-9)
        fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, scale="slaney", norm="slaney")
    else:
        raise ValueError(f"unknown mel flavor {cfg.flavor!r}")
    # tiny (freq x mel) contraction; force full fp32 accumulation for parity
    mel = jnp.einsum("bnf,fm->bnm", mag, jnp.asarray(fb, dtype=mag.dtype), precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


def bucketed_log_mel(wav: np.ndarray, cfg: MelConfig = MelConfig(), bucket: int = 32_768) -> np.ndarray:
    """Host API: log-mel of ONE waveform ``(samples,)`` -> ``(frames, n_mels)``.

    Pads the sample count up to a ``bucket`` multiple before the jitted
    ``log_mel_spectrogram`` and slices back to the true ``samples // hop``
    frame count — so XLA compiles the mel graph a bounded number of times
    instead of once per distinct utterance length (a real corpus has thousands
    of distinct lengths; through a remote-compile tunnel each is minutes)."""
    n = len(wav)
    padded = -(-max(n, 1) // bucket) * bucket
    frames = n // cfg.hop_length
    wav = np.pad(np.asarray(wav, np.float32), (0, padded - n))
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(wav[None]), cfg))[0]
    return mel[:frames]
