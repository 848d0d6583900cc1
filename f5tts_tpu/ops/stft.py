"""Inverse STFT (overlap-add) for the Vocos ISTFT vocoder head.

Matches ``torch.istft(..., center=True)`` semantics: per-frame iRFFT, synthesis
window multiply, overlap-add, division by the squared-window envelope, then
``n_fft//2`` trim at both ends.

TPU-first formulation: when ``hop | n_fft`` (true for the 1024/256 family) the
overlap-add is expressed as ``R = n_fft/hop`` shifted reshapes + adds — pure
XLA ops, no scatter. The window envelope is precomputed host-side per static
frame count.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from f5tts_tpu.ops.mel import hann_window


def _fold_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add ``(b, T, n_fft)`` -> ``(b, (T-1)*hop + n_fft)`` (hop | n_fft)."""
    b, T, n_fft = frames.shape
    R = n_fft // hop
    out_len = (T - 1) * hop + n_fft
    total = jnp.zeros((b, out_len), frames.dtype)
    for r in range(R):
        # slice r of every frame lands at offset r*hop in a contiguous T*hop run
        part = frames[:, :, r * hop : (r + 1) * hop].reshape(b, T * hop)
        total = total.at[:, r * hop : r * hop + T * hop].add(part)
    return total


def _window_envelope(T: int, n_fft: int, hop: int, win_length: int) -> np.ndarray:
    w = hann_window(win_length).astype(np.float64)
    env = np.zeros((T - 1) * hop + n_fft)
    for t in range(T):
        env[t * hop : t * hop + n_fft] += w * w
    return env


@functools.lru_cache(maxsize=4)
def _irdft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag inverse-rDFT bases ``(n_freq, n_fft)`` such that
    ``irfft(S) = Re(S) @ C + Im(S) @ D``. Turns the per-frame iFFT into two
    MXU matmuls — TPU's FFT lowering is far slower than its systolic array for
    n_fft ~ 1k."""
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    # irfft coefficient weights: DC and Nyquist count once, others twice
    w = np.full((n_freq, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    c = (np.cos(ang) * w / n_fft).astype(np.float32)
    d = (-np.sin(ang) * w / n_fft).astype(np.float32)
    return c, d


def irfft_matmul(spec: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    c, d = _irdft_basis(n_fft)
    return (
        jnp.real(spec).astype(jnp.float32) @ jnp.asarray(c)
        + jnp.imag(spec).astype(jnp.float32) @ jnp.asarray(d)
    )


def stft_complex(
    wav: jnp.ndarray,  # (b, samples)
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT ``(b, frames, n_freq)`` frame-major (analysis counterpart
    of :func:`istft`)."""
    from f5tts_tpu.ops.mel import frame_signal

    window = jnp.asarray(hann_window(win_length), dtype=wav.dtype)
    if center:
        pad = n_fft // 2
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(wav, n_fft, hop_length) * window
    return jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)


def istft_reim(
    re: jnp.ndarray,  # (b, T, n_freq)
    im: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    center: bool = True,
) -> jnp.ndarray:
    """iSTFT from separate real/imag parts (avoids complex dtype entirely on
    the hot path; iDFT runs as two MXU matmuls)."""
    assert n_fft % hop_length == 0, "overlap-add fast path needs hop | n_fft"
    b, T, _ = re.shape
    c, d = _irdft_basis(n_fft)
    frames = re.astype(jnp.float32) @ jnp.asarray(c) + im.astype(jnp.float32) @ jnp.asarray(d)
    window = jnp.asarray(hann_window(win_length))
    frames = frames * window
    y = _fold_add(frames, hop_length)
    env = jnp.asarray(_window_envelope(T, n_fft, hop_length, win_length).astype(np.float32))
    y = y / jnp.maximum(env, 1e-11)
    if center:
        pad = n_fft // 2
        y = y[:, pad:-pad]
    return y


def istft(
    spec: jnp.ndarray,  # complex (b, T, n_freq) frame-major, n_freq = n_fft//2+1
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    center: bool = True,
    use_matmul_idft: bool = True,
) -> jnp.ndarray:
    """Returns ``(b, (T-1)*hop)`` waveform for ``center=True``."""
    if use_matmul_idft:
        return istft_reim(jnp.real(spec), jnp.imag(spec), n_fft, hop_length, win_length, center)
    b, T, _ = spec.shape
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1).astype(jnp.float32)
    window = jnp.asarray(hann_window(win_length))
    frames = frames * window
    y = _fold_add(frames, hop_length)
    env = jnp.asarray(_window_envelope(T, n_fft, hop_length, win_length).astype(np.float32))
    y = y / jnp.maximum(env, 1e-11)
    if center:
        pad = n_fft // 2
        y = y[:, pad:-pad]
    return y
