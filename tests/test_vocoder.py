"""Vocoder goldens: iSTFT overlap-add vs torch.istft; Vocos decode vs torch ref."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import torch_ref as tr
from f5tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode
from f5tts_tpu.ops.stft import istft


def test_istft_vs_torch():
    rng = np.random.default_rng(0)
    T, n_fft, hop = 40, 1024, 256
    re = rng.standard_normal((2, T, n_fft // 2 + 1)).astype(np.float32)
    im = rng.standard_normal((2, T, n_fft // 2 + 1)).astype(np.float32)
    spec = re + 1j * im

    ours = np.asarray(istft(jnp.asarray(spec), n_fft, hop, n_fft, center=True))
    window = torch.hann_window(n_fft)
    ref = torch.istft(torch.from_numpy(spec).transpose(1, 2), n_fft, hop, n_fft, window, center=True).numpy()
    assert ours.shape == ref.shape == (2, (T - 1) * hop)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_vocos_decode_vs_torch():
    cfg = VocosConfig(input_channels=20, dim=48, intermediate_dim=96, num_layers=3)
    params = init_vocos(jax.random.PRNGKey(0), cfg)
    np_params = jax.tree.map(np.asarray, params)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 25, 20)).astype(np.float32) * 0.5

    ours = np.asarray(vocos_decode(params, jnp.asarray(mel), cfg))
    ref = tr.vocos_decode(np_params, torch.from_numpy(mel), cfg.n_fft, cfg.hop_length).numpy()
    assert ours.shape == ref.shape == (2, 24 * 256)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_stft_istft_roundtrip():
    """Analysis -> synthesis reconstructs the interior of the signal exactly
    (perfect-reconstruction property of hann/hop=n_fft/4 with envelope div)."""
    from f5tts_tpu.ops.stft import stft_complex

    rng = np.random.default_rng(3)
    wav = rng.standard_normal((1, 24000)).astype(np.float32) * 0.4
    spec = stft_complex(jnp.asarray(wav), 1024, 256, 1024, center=True)
    rec = np.asarray(istft(spec, 1024, 256, 1024, center=True))
    n = min(rec.shape[1], wav.shape[1])
    interior = slice(1024, n - 1024)
    np.testing.assert_allclose(rec[0, interior], wav[0, interior], atol=2e-4)


def test_vocos_param_count_real_config():
    # charactr/vocos-mel-24khz is ~13.5M params
    shapes = jax.eval_shape(lambda k: init_vocos(k, VocosConfig()), jax.random.PRNGKey(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 12e6 < n < 15e6, n
