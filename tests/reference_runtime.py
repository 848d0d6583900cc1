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
    sys.modules.setdefault(
        "pypinyin", _module("pypinyin", lazy_pinyin=None, Style=types.SimpleNamespace(TONE3=None))
    )

    # mask the trainer chain (wandb/ema_pytorch/datasets are not installed;
    # f5_tts.model.__init__ imports Trainer unconditionally)
    sys.modules.setdefault("f5_tts.model.trainer", _module("f5_tts.model.trainer", Trainer=None))


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
