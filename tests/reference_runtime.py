"""Import and execute the ACTUAL reference model code as the parity golden.

VERDICT round-1 gap #1: every F5 parity test compared against
``tests/torch_ref.py`` — our own torch re-statement of the reference math.
This module instead loads ``/root/reference/src/server/f5_tts`` itself
(read-only; nothing is copied) so goldens run the reference's real
``DiT``/``UNetT``/``MMDiT``/``CFM`` classes on CPU.

The reference's pip deps that are absent from this environment are stubbed
with small faithful implementations:

- ``x_transformers.x_transformers.{RotaryEmbedding, apply_rotary_pos_emb}``
  and ``x_transformers.RMSNorm`` — re-stated from the upstream library's
  semantics: ``freqs = cat([t ⊗ inv_freq, t ⊗ inv_freq], -1)``, half-split
  (GPT-NeoX) ``rotate_half``, partial rotation of the first ``rot_dim``
  channels of the *flat* (pre-head-split) q/k, ``RMSNorm(x) =
  F.normalize(x, dim=-1) * sqrt(dim) * g``.
- ``torchdiffeq.odeint`` — fixed-grid explicit Euler/midpoint, the only
  methods the reference ever requests (``model/cfm.py:40``).
- ``torchaudio.transforms.MelSpectrogram`` — torch.stft + HTK filterbank
  matmul (power=1, center, reflect pad), with ``spectrogram.window`` /
  ``mel_scale.fb`` buffers under the same child-module names torchaudio
  uses, so state dicts can carry the authentic stale-buffer keys that
  ``infer/utils_infer.py:203-207`` drops.
- ``librosa.filters.mel`` — slaney filterbank from ``f5tts_tpu.ops.mel``.
- ``jieba`` / ``pypinyin`` — import-time placeholders (only the Chinese G2P
  path touches them, and no golden exercises it).

``f5_tts.model.trainer`` is masked with an empty module so importing
``f5_tts.model`` does not drag in wandb/ema_pytorch/datasets; the trainer is
covered by capability parity, not numerical goldens.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from f5tts_tpu.ops.mel import hann_window, mel_filterbank

REFERENCE_ROOT = "/root/reference/src/server"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "f5_tts", "model"))


# ---------------------------------------------------------------------------
# x_transformers stub (x_transformers/x_transformers.py semantics)
# ---------------------------------------------------------------------------


class RotaryEmbedding(nn.Module):
    def __init__(self, dim, use_xpos=False, scale_base=512, interpolation_factor=1.0,
                 base=10000, base_rescale_factor=1.0):
        super().__init__()
        base = base * base_rescale_factor ** (dim / (dim - 2))
        inv_freq = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
        self.register_buffer("inv_freq", inv_freq, persistent=False)
        assert interpolation_factor >= 1.0
        self.interpolation_factor = interpolation_factor
        assert not use_xpos, "reference never enables xpos"

    def forward_from_seq_len(self, seq_len):
        t = torch.arange(seq_len, device=self.inv_freq.device)
        return self.forward(t)

    def forward(self, t):
        freqs = torch.einsum("i,j->ij", t.type_as(self.inv_freq), self.inv_freq)
        freqs = freqs / self.interpolation_factor
        freqs = torch.cat((freqs, freqs), dim=-1)
        return freqs, 1.0


def _rotate_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat((-x2, x1), dim=-1)


def apply_rotary_pos_emb(t, freqs, scale=1):
    rot_dim, seq_len = freqs.shape[-1], t.shape[-2]
    freqs = freqs[-seq_len:, :]
    t_rot, t_unrotated = t[..., :rot_dim], t[..., rot_dim:]
    t_rot = (t_rot * freqs.cos() * scale) + (_rotate_half(t_rot) * freqs.sin() * scale)
    return torch.cat((t_rot, t_unrotated), dim=-1)


class RMSNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = dim**0.5
        self.g = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return F.normalize(x, dim=-1) * self.scale * self.g


# ---------------------------------------------------------------------------
# torchdiffeq stub (fixed-grid explicit solvers)
# ---------------------------------------------------------------------------


def odeint(func, y0, t, method="euler", **kwargs):
    ys = [y0]
    y = y0
    for i in range(t.shape[0] - 1):
        t0, dt = t[i], t[i + 1] - t[i]
        if method == "euler":
            y = y + dt * func(t0, y)
        elif method == "midpoint":
            y = y + dt * func(t0 + dt / 2, y + dt / 2 * func(t0, y))
        else:  # pragma: no cover
            raise NotImplementedError(method)
        ys.append(y)
    return torch.stack(ys)


# ---------------------------------------------------------------------------
# torchaudio stub (MelSpectrogram with torchaudio's child-module names)
# ---------------------------------------------------------------------------


class _Spectrogram(nn.Module):
    def __init__(self, n_fft, win_length, hop_length, power):
        super().__init__()
        self.n_fft, self.win_length, self.hop_length, self.power = n_fft, win_length, hop_length, power
        self.register_buffer("window", torch.from_numpy(hann_window(win_length)))

    def forward(self, wav):
        spec = torch.stft(
            wav, self.n_fft, hop_length=self.hop_length, win_length=self.win_length,
            window=self.window, center=True, pad_mode="reflect", return_complex=True,
        ).abs()
        if self.power != 1:
            spec = spec.pow(self.power)
        return spec


class _MelScale(nn.Module):
    def __init__(self, sample_rate, n_fft, n_mels, norm):
        super().__init__()
        fb = mel_filterbank(sample_rate, n_fft, n_mels, scale="htk", norm=norm)
        self.register_buffer("fb", torch.from_numpy(fb))  # (n_freqs, n_mels)

    def forward(self, spec):  # (b, freq, time) -> (b, n_mels, time)
        return torch.matmul(spec.transpose(-1, -2), self.fb).transpose(-1, -2)


class MelSpectrogram(nn.Module):
    def __init__(self, sample_rate=16000, n_fft=400, win_length=None, hop_length=None,
                 n_mels=128, power=2.0, center=True, normalized=False, norm=None, **kwargs):
        super().__init__()
        assert center and not normalized
        self.spectrogram = _Spectrogram(n_fft, win_length or n_fft, hop_length or n_fft // 2, power)
        self.mel_scale = _MelScale(sample_rate, n_fft, n_mels, norm)

    def forward(self, wav):
        return self.mel_scale(self.spectrogram(wav))


# ---------------------------------------------------------------------------
# pydub stub (int16-backed AudioSegment + pydub.silence algorithms, restated
# from the upstream library's documented semantics; used only so the
# reference's infer/utils_infer.py L2 pipeline can EXECUTE here — the goldens
# compare it against f5tts_tpu.audio.preprocess's independent vectorized
# implementation)
# ---------------------------------------------------------------------------


class AudioSegment:
    def __init__(self, samples: np.ndarray, frame_rate: int):
        self._samples = np.asarray(samples, np.int16)
        self.frame_rate = int(frame_rate)

    # --- constructors
    @classmethod
    def from_file(cls, path):
        import wave

        with wave.open(str(path), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            data = np.frombuffer(w.readframes(n), dtype=np.int16)
            if w.getnchannels() > 1:
                data = data.reshape(-1, w.getnchannels()).mean(axis=1).astype(np.int16)
        return cls(data, sr)

    @classmethod
    def silent(cls, duration=1000, frame_rate=11025):
        return cls(np.zeros(int(frame_rate * duration / 1000), np.int16), frame_rate)

    # --- core protocol (pydub: lengths/indices in milliseconds)
    def __len__(self):
        return round(1000 * len(self._samples) / self.frame_rate)

    def _ms_to_idx(self, ms):
        return int(ms * (self.frame_rate / 1000.0))

    def __getitem__(self, key):
        if isinstance(key, slice):
            a = 0 if key.start is None else key.start
            b = len(self) if key.stop is None else key.stop
            if a < 0:
                a = len(self) + a
            if b < 0:
                b = len(self) + b
            return AudioSegment(self._samples[self._ms_to_idx(a) : self._ms_to_idx(b)], self.frame_rate)
        return self[key : key + 1]  # one-millisecond frame (pydub iteration unit)

    def __add__(self, other):
        if isinstance(other, AudioSegment):
            # pydub _sync: both operands convert to the higher frame rate
            rate = max(self.frame_rate, other.frame_rate)
            a, b = self._resampled(rate), other._resampled(rate)
            return AudioSegment(np.concatenate([a._samples, b._samples]), rate)
        raise NotImplementedError("gain arithmetic not needed by the goldens")

    def _resampled(self, rate):
        if rate == self.frame_rate or len(self._samples) == 0:
            return AudioSegment(self._samples, rate)
        if not self._samples.any():  # silence: duration-preserving zeros
            n = int(round(len(self._samples) * rate / self.frame_rate))
            return AudioSegment(np.zeros(n, np.int16), rate)
        from scipy.signal import resample_poly

        g = np.gcd(rate, self.frame_rate)
        out = resample_poly(self._samples.astype(np.float64), rate // g, self.frame_rate // g)
        return AudioSegment(np.clip(out, -32768, 32767).astype(np.int16), rate)

    def __radd__(self, other):  # sum() support
        if other == 0:
            return self
        raise NotImplementedError

    # --- analysis
    @property
    def rms(self):
        if len(self._samples) == 0:
            return 0
        return int(np.sqrt(np.mean(np.square(self._samples.astype(np.float64)))))

    @property
    def max_possible_amplitude(self):
        return 32768.0

    @property
    def dBFS(self):
        if self.rms == 0:
            return -float("inf")
        return 20.0 * np.log10(self.rms / self.max_possible_amplitude)

    @property
    def duration_seconds(self):
        return len(self._samples) / self.frame_rate

    def export(self, path, format="wav"):
        import wave

        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(self.frame_rate)
            w.writeframes(self._samples.tobytes())

    def numpy(self) -> np.ndarray:  # test helper (not part of pydub's API)
        return self._samples.astype(np.float32) / 32768.0


def _db_to_float(db):
    return 10.0 ** (db / 20.0)


def detect_silence_pd(audio_segment, min_silence_len=1000, silence_thresh=-16, seek_step=1):
    seg_len = len(audio_segment)
    if seg_len < min_silence_len:
        return []
    silence_thresh_amp = _db_to_float(silence_thresh) * audio_segment.max_possible_amplitude
    silence_starts = []
    last_slice_start = seg_len - min_silence_len
    slice_starts = list(range(0, last_slice_start + 1, seek_step))
    if last_slice_start % seek_step:
        slice_starts.append(last_slice_start)
    for i in slice_starts:
        if audio_segment[i : i + min_silence_len].rms <= silence_thresh_amp:
            silence_starts.append(i)
    if not silence_starts:
        return []
    silent_ranges = []
    prev_i = silence_starts.pop(0)
    current_range_start = prev_i
    for silence_start_i in silence_starts:
        continuous = silence_start_i == prev_i + seek_step
        silence_has_gap = silence_start_i > (prev_i + min_silence_len)
        if not continuous and silence_has_gap:
            silent_ranges.append([current_range_start, prev_i + min_silence_len])
            current_range_start = silence_start_i
        prev_i = silence_start_i
    silent_ranges.append([current_range_start, prev_i + min_silence_len])
    return silent_ranges


def detect_nonsilent_pd(audio_segment, min_silence_len=1000, silence_thresh=-16, seek_step=1):
    silent_ranges = detect_silence_pd(audio_segment, min_silence_len, silence_thresh, seek_step)
    len_seg = len(audio_segment)
    if not silent_ranges:
        return [[0, len_seg]]
    if silent_ranges[0][0] == 0 and silent_ranges[0][1] == len_seg:
        return []
    prev_end_i = 0
    nonsilent_ranges = []
    for start_i, end_i in silent_ranges:
        nonsilent_ranges.append([prev_end_i, start_i])
        prev_end_i = end_i
    if end_i != len_seg:
        nonsilent_ranges.append([prev_end_i, len_seg])
    if nonsilent_ranges[0] == [0, 0]:
        nonsilent_ranges.pop(0)
    return nonsilent_ranges


def split_on_silence_pd(audio_segment, min_silence_len=1000, silence_thresh=-16,
                        keep_silence=100, seek_step=1):
    if isinstance(keep_silence, bool):
        keep_silence = len(audio_segment) if keep_silence else 0
    output_ranges = [
        [start - keep_silence, end + keep_silence]
        for (start, end) in detect_nonsilent_pd(audio_segment, min_silence_len, silence_thresh, seek_step)
    ]
    for range_i, range_ii in zip(output_ranges, output_ranges[1:]):
        last_end = range_i[1]
        next_start = range_ii[0]
        if next_start < last_end:
            range_i[1] = (last_end + next_start) // 2
            range_ii[0] = range_i[1]
    return [
        audio_segment[max(start, 0) : min(end, len(audio_segment))]
        for start, end in output_ranges
    ]


def detect_leading_silence_pd(sound, silence_threshold=-50.0, chunk_size=10):
    trim_ms = 0
    assert chunk_size > 0
    while sound[trim_ms : trim_ms + chunk_size].dBFS < silence_threshold and trim_ms < len(sound):
        trim_ms += chunk_size
    return min(trim_ms, len(sound))


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------


def _module(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    # a well-formed spec + version: other libraries probe availability with
    # importlib.util.find_spec / __version__ (transformers does for librosa),
    # and a spec-less sys.modules entry makes find_spec raise ValueError
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    mod.__version__ = "0.0.0+f5tpu-test-stub"
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_stubs():
    if "x_transformers" in sys.modules and hasattr(sys.modules["x_transformers"], "__f5tpu_stub__"):
        return
    xt_inner = _module(
        "x_transformers.x_transformers",
        RotaryEmbedding=RotaryEmbedding,
        apply_rotary_pos_emb=apply_rotary_pos_emb,
        RMSNorm=RMSNorm,
    )
    xt = _module("x_transformers", RMSNorm=RMSNorm, x_transformers=xt_inner)
    xt.__f5tpu_stub__ = True
    sys.modules["x_transformers"] = xt
    sys.modules["x_transformers.x_transformers"] = xt_inner

    sys.modules.setdefault("torchdiffeq", _module("torchdiffeq", odeint=odeint))

    ta_transforms = _module("torchaudio.transforms", MelSpectrogram=MelSpectrogram)
    ta = _module("torchaudio", transforms=ta_transforms)
    sys.modules.setdefault("torchaudio", ta)
    sys.modules.setdefault("torchaudio.transforms", ta_transforms)

    def _librosa_mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kwargs):
        return mel_filterbank(sr, n_fft, n_mels, fmin=fmin, fmax=fmax, scale="slaney", norm="slaney").T

    lf = _module("librosa.filters", mel=_librosa_mel)
    sys.modules.setdefault("librosa", _module("librosa", filters=lf))
    sys.modules.setdefault("librosa.filters", lf)

    sys.modules.setdefault(
        "jieba", _module("jieba", initialize=lambda *a, **k: None, cut=lambda s: [s])
    )
    # lazy_pinyin passes non-Chinese input through unchanged (upstream
    # pypinyin behavior for errors="default" on non-Han chars) — the goldens
    # never exercise actual Chinese G2P, but Indic scripts are 3-byte UTF-8
    # and reach convert_char_to_pinyin's "pure east asian" branch
    sys.modules.setdefault(
        "pypinyin",
        _module("pypinyin", lazy_pinyin=lambda seg, style=None, tone_sandhi=False: list(seg),
                Style=types.SimpleNamespace(TONE3=None)),
    )

    # mask the trainer chain (wandb/ema_pytorch/datasets are not installed;
    # f5_tts.model.__init__ imports Trainer unconditionally)
    sys.modules.setdefault("f5_tts.model.trainer", _module("f5_tts.model.trainer", Trainer=None))


def _install_infer_stubs():
    """Extra stubs for the L2 pipeline (``f5_tts/infer/utils_infer.py``):
    pydub (AudioSegment + silence algorithms above), vocos (import-time
    placeholder — load_vocoder is never executed by goldens), torchaudio.load
    / torchaudio.transforms.Resample."""
    silence_mod = _module(
        "pydub.silence",
        detect_silence=detect_silence_pd,
        detect_nonsilent=detect_nonsilent_pd,
        split_on_silence=split_on_silence_pd,
        detect_leading_silence=detect_leading_silence_pd,
    )
    pydub = _module("pydub", AudioSegment=AudioSegment, silence=silence_mod)
    sys.modules.setdefault("pydub", pydub)
    sys.modules.setdefault("pydub.silence", silence_mod)

    class _Vocos:  # pragma: no cover - placeholder only
        @classmethod
        def from_pretrained(cls, *a, **k):
            raise RuntimeError("vocos stub: not available in tests")

        from_hparams = from_pretrained

    sys.modules.setdefault("vocos", _module("vocos", Vocos=_Vocos))

    ta = sys.modules.get("torchaudio")
    if ta is not None and not hasattr(ta, "load"):
        def _load(path):
            seg = AudioSegment.from_file(path)
            return torch.from_numpy(seg.numpy()).unsqueeze(0), seg.frame_rate

        class _Resample(nn.Module):
            def __init__(self, orig_freq, new_freq):
                super().__init__()
                self.orig_freq, self.new_freq = orig_freq, new_freq

            def forward(self, wav):
                from scipy.signal import resample_poly

                g = np.gcd(self.orig_freq, self.new_freq)
                out = resample_poly(wav.numpy(), self.new_freq // g, self.orig_freq // g, axis=-1)
                return torch.from_numpy(np.ascontiguousarray(out, np.float32))

        ta.load = _load
        ta.transforms.Resample = _Resample


def load_reference_infer():
    """Returns the ACTUAL ``f5_tts.infer.utils_infer`` module of the
    reference tree (L2 pipeline: chunking, duration heuristic, batch loop,
    crossfade stitch, ref-audio preprocessing)."""
    if not reference_available():
        import pytest

        pytest.skip("reference tree not mounted at /root/reference")
    _install_stubs()
    _install_infer_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import f5_tts.infer.utils_infer as ref_infer  # noqa: PLC0415

    return ref_infer


def load_reference():
    """Returns the ``f5_tts.model`` package of the actual reference tree."""
    if not reference_available():
        import pytest

        pytest.skip("reference tree not mounted at /root/reference")
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import f5_tts.model as ref_model  # noqa: PLC0415

    return ref_model


def state_dict_to_numpy(module: nn.Module) -> dict[str, np.ndarray]:
    return {k: v.detach().cpu().float().numpy() for k, v in module.state_dict().items()}
