"""Numerical goldens vs torch kernels (BASELINE config #1 strategy, SURVEY §4.1)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import torch_ref as tr
from f5tts_tpu.models import modules as m
from f5tts_tpu.models.cfm import CFMConfig, cfm_loss
from f5tts_tpu.models.dit import DiTConfig, dit_forward, init_dit, param_count
from f5tts_tpu.ops.mel import MelConfig, hann_window, log_mel_spectrogram, mel_filterbank
from f5tts_tpu.ops.masks import lens_to_mask
from f5tts_tpu.ops.rope import apply_rotary, rotary_freqs
from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
    text_num_embeds=30, text_dim=32, conv_layers=2, max_pos=256,
)


def tiny_cfg_dict(cfg=TINY):
    return {"dim_head": cfg.dim_head, "heads": cfg.heads, "text_dim": cfg.text_dim, "max_pos": cfg.max_pos}


@pytest.fixture(scope="module")
def tiny_params():
    params = init_dit(jax.random.PRNGKey(0), TINY)
    return params, jax.tree.map(np.asarray, params)


def test_param_count_base_config():
    # F5-TTS Base (DiT dim 1024 depth 22 heads 16 ff 2, text_dim 512, conv 4)
    # counts 335.8M params (scripts/count_params_gflops.py:23). Shape-only init.
    shapes = jax.eval_shape(lambda k: init_dit(k, DiTConfig.base()), jax.random.PRNGKey(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert abs(n - 335.8e6) / 335.8e6 < 0.01, n


def test_mel_vocos_vs_torch():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 12000)).astype(np.float32) * 0.2
    cfg = MelConfig(flavor="vocos")
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(wav), cfg))

    w = torch.from_numpy(wav)
    window = torch.from_numpy(hann_window(1024))
    spec = torch.stft(w, 1024, 256, 1024, window, center=True, pad_mode="reflect", return_complex=True).abs()
    fb = torch.from_numpy(mel_filterbank(24000, 1024, 100, scale="htk", norm=None))
    mel = torch.matmul(spec.transpose(1, 2), fb)
    ref = torch.log(torch.clamp(mel, min=1e-5)).numpy()

    assert ours.shape == ref.shape == (2, 1 + 12000 // 256, 100)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_mel_bigvgan_vs_torch():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((1, 8192)).astype(np.float32) * 0.1
    cfg = MelConfig(flavor="bigvgan")
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(wav), cfg))

    w = torch.from_numpy(wav)
    pad = (1024 - 256) // 2
    w = torch.nn.functional.pad(w.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    window = torch.from_numpy(hann_window(1024))
    spec = torch.stft(w, 1024, 256, 1024, window, center=False, return_complex=True)
    spec = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9)
    fb = torch.from_numpy(mel_filterbank(24000, 1024, 100, scale="slaney", norm="slaney"))
    mel = torch.matmul(spec.transpose(1, 2), fb)
    ref = torch.log(torch.clamp(mel, min=1e-5)).numpy()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_rope_parity():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 17, 64)).astype(np.float32)
    freqs = rotary_freqs(17, 32)
    ours = np.asarray(apply_rotary(jnp.asarray(x), jnp.asarray(freqs)))
    ref = tr.apply_rotary(torch.from_numpy(x), tr.rotary_freqs(17, 32)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_attention_parity(tiny_params):
    params, np_params = tiny_params
    p = jax.tree.map(lambda x: x[0], params["blocks"]["attn"])
    p_np = jax.tree.map(np.asarray, p)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 33, TINY.dim)).astype(np.float32)
    mask = np.ones((2, 33), dtype=bool)
    mask[1, 20:] = False
    freqs = rotary_freqs(33, TINY.dim_head)

    ours = np.asarray(m.attention(p, jnp.asarray(x), TINY.heads, jnp.asarray(freqs), jnp.asarray(mask)))
    ref = tr.attention(p_np, torch.from_numpy(x), TINY.heads, tr.rotary_freqs(33, TINY.dim_head), torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_convnext_parity(tiny_params):
    params, np_params = tiny_params
    blk = jax.tree.map(lambda x: x[0], params["text_embed"]["blocks"])
    blk_np = jax.tree.map(np.asarray, blk)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 25, TINY.text_dim)).astype(np.float32)
    ours = np.asarray(m.convnext_v2_block(blk, jnp.asarray(x)))
    ref = tr.convnext_v2_block(blk_np, torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_dit_forward_parity(tiny_params):
    params, np_params = tiny_params
    rng = np.random.default_rng(5)
    b, n, nt = 2, 40, 18
    x = rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32)
    cond = rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32)
    text = rng.integers(0, TINY.text_num_embeds, (b, nt)).astype(np.int32)
    text[1, 12:] = -1
    time = np.array([0.3, 0.7], dtype=np.float32)
    mask = np.ones((b, n), dtype=bool)
    mask[1, 30:] = False

    for drop_a, drop_t in [(False, False), (True, True), (True, False)]:
        ours = np.asarray(
            dit_forward(
                params, TINY, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text), jnp.asarray(time),
                jnp.full((b,), drop_a), jnp.full((b,), drop_t), jnp.asarray(mask),
            )
        )
        ref = tr.dit_forward(
            np_params, tiny_cfg_dict(), torch.from_numpy(x), torch.from_numpy(cond),
            torch.from_numpy(text).long(), torch.from_numpy(time), drop_a, drop_t, torch.from_numpy(mask),
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


def test_sampler_parity_vs_reference_loop(tiny_params):
    """Fused-CFG scan Euler == reference's sequential two-forward Euler loop."""
    params, np_params = tiny_params
    rng = np.random.default_rng(6)
    b, n = 2, 48
    cond = rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32)
    cond_lens = np.array([20, 16], dtype=np.int32)
    text = rng.integers(0, TINY.text_num_embeds, (b, 24)).astype(np.int32)
    text[0, 21:] = -1
    text[1, 10:] = -1
    duration = np.array([48, 40], dtype=np.int32)
    y0 = rng.standard_normal((b, n, TINY.mel_dim)).astype(np.float32)

    # zero noise past duration as the sampler contract requires
    dur_mask = np.arange(n)[None, :] < duration[:, None]
    y0 = np.where(dur_mask[..., None], y0, 0.0)

    sampler = SamplerConfig(steps=4, cfg_strength=2.0, sway_sampling_coef=-1.0)
    ours = np.asarray(
        sample_cfm(
            params, TINY, cond=jnp.asarray(cond), cond_lens=jnp.asarray(cond_lens),
            text=jnp.asarray(text), duration=jnp.asarray(duration), sampler=sampler, y0=jnp.asarray(y0),
        )
    )

    # reference-semantics: lens = max(text_lens, cond_lens); masks
    text_lens = (text != -1).sum(-1)
    lens = np.maximum(text_lens, cond_lens)
    cond_mask = np.arange(n)[None, :] < lens[:, None]
    duration_c = np.clip(np.maximum(lens + 1, duration), None, n)
    attn_mask = np.arange(n)[None, :] < duration_c[:, None]
    ref = tr.euler_cfg_sample(
        np_params, tiny_cfg_dict(),
        cond=torch.from_numpy(cond), cond_mask=torch.from_numpy(cond_mask),
        attn_mask=torch.from_numpy(attn_mask), text=torch.from_numpy(text).long(),
        y0=torch.from_numpy(y0), steps=4, cfg_strength=2.0, sway_coef=-1.0,
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_sample_noise_batch_invariance():
    from f5tts_tpu.sampling.euler import sample_noise

    key = jax.random.PRNGKey(7)
    d1 = jnp.asarray([30], dtype=jnp.int32)
    d2 = jnp.asarray([30, 25], dtype=jnp.int32)
    n1 = sample_noise(key, 1, 32, 8, d1)
    n2 = sample_noise(key, 2, 32, 8, d2)
    np.testing.assert_allclose(np.asarray(n1[0]), np.asarray(n2[0]))
    assert np.all(np.asarray(n2[1, 25:]) == 0.0)


def test_cfm_loss_and_grads(tiny_params):
    params, _ = tiny_params
    cfg = CFMConfig(model=TINY)
    rng = np.random.default_rng(8)
    mel = jnp.asarray(rng.standard_normal((2, 32, TINY.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, TINY.text_num_embeds, (2, 12)).astype(np.int32))
    lens = jnp.asarray([32, 24], dtype=jnp.int32)

    (loss, aux), grads = jax.jit(jax.value_and_grad(cfm_loss, has_aux=True), static_argnums=1)(
        params, cfg, jax.random.PRNGKey(0), mel, text, lens)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # gradient reaches every parameter except possibly unused embedding rows
    nonzero = sum(int(np.any(np.asarray(g) != 0)) for g in flat)
    assert nonzero >= len(flat) - 1


def test_lens_to_mask():
    mask = np.asarray(lens_to_mask(jnp.asarray([2, 5]), 6))
    assert mask.tolist() == [[True, True, False, False, False, False], [True] * 5 + [False]]


def test_custom_time_grid(tiny_params):
    """SamplerConfig.time_grid: explicit knots equal to the sway grid reproduce
    the default output exactly; pruned grids run; malformed grids are rejected."""
    tiny_params, _ = tiny_params
    rng = np.random.default_rng(11)
    cond = jnp.asarray(rng.standard_normal((1, 40, TINY.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 20, (1, 12)), jnp.int32)
    kw = dict(cond=cond, cond_lens=jnp.asarray([12]), text=text,
              duration=jnp.asarray([40]), seeds=jnp.asarray([3]))

    from f5tts_tpu.sampling.euler import sway_time_grid

    base = sample_cfm(tiny_params, TINY, sampler=SamplerConfig(steps=4), **kw)
    knots = tuple(float(t) for t in np.asarray(sway_time_grid(4, -1.0)))
    knots = (0.0,) + knots[1:-1] + (1.0,)  # exact endpoints
    explicit = sample_cfm(tiny_params, TINY, sampler=SamplerConfig(steps=4, time_grid=knots), **kw)
    np.testing.assert_allclose(np.asarray(base), np.asarray(explicit), atol=1e-6)

    pruned = sample_cfm(
        tiny_params, TINY, sampler=SamplerConfig(time_grid=(0.0, 0.05, 0.2, 1.0)), **kw)
    assert bool(jnp.isfinite(pruned).all())
    assert float(jnp.abs(pruned - base).max()) > 0

    with pytest.raises(ValueError):
        sample_cfm(tiny_params, TINY, sampler=SamplerConfig(time_grid=(0.0, 0.5, 0.4, 1.0)), **kw)


def test_cfg_interval(tiny_params):
    """SamplerConfig.cfg_interval: an interval covering every step reproduces
    the default exactly (partition machinery is lossless); an interval
    covering none matches the unguided (cfg_strength=0) path; a middle
    interval runs and sits between the two."""
    tiny_params, _ = tiny_params
    rng = np.random.default_rng(13)
    cond = jnp.asarray(rng.standard_normal((2, 40, TINY.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 20, (2, 12)), jnp.int32)
    kw = dict(cond=cond, cond_lens=jnp.asarray([12, 9]), text=text,
              duration=jnp.asarray([40, 33]), seeds=jnp.asarray([3, 4]))

    base = sample_cfm(tiny_params, TINY, sampler=SamplerConfig(steps=4), **kw)
    full = sample_cfm(
        tiny_params, TINY, sampler=SamplerConfig(steps=4, cfg_interval=(0.0, 2.0)), **kw)
    np.testing.assert_allclose(np.asarray(base), np.asarray(full), atol=1e-6)

    none = sample_cfm(
        tiny_params, TINY, sampler=SamplerConfig(steps=4, cfg_interval=(2.0, 3.0)), **kw)
    unguided = sample_cfm(
        tiny_params, TINY, sampler=SamplerConfig(steps=4, cfg_strength=0.0), **kw)
    np.testing.assert_allclose(np.asarray(none), np.asarray(unguided), atol=1e-6)

    mid = sample_cfm(
        tiny_params, TINY, sampler=SamplerConfig(steps=4, cfg_interval=(0.2, 0.8)), **kw)
    assert bool(jnp.isfinite(mid).all())
    assert float(jnp.abs(mid - base).max()) > 0
    assert float(jnp.abs(mid - none).max()) > 0


def test_cfg_interval_under_jit(tiny_params):
    """Regression: the knot partition must not device_get a traced grid
    (omnistaging stages every jnp op inside jit, even on static inputs)."""
    tiny_params, _ = tiny_params
    rng = np.random.default_rng(17)
    cond = jnp.asarray(rng.standard_normal((1, 40, TINY.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 20, (1, 12)), jnp.int32)
    sampler = SamplerConfig(steps=4, cfg_interval=(0.0, 0.5))

    @jax.jit
    def f(cond, text, seeds):
        return sample_cfm(tiny_params, TINY, cond=cond, cond_lens=jnp.asarray([12]),
                          text=text, duration=jnp.asarray([40]), sampler=sampler, seeds=seeds)

    jitted = f(cond, text, jnp.asarray([3]))
    eager = sample_cfm(tiny_params, TINY, cond=cond, cond_lens=jnp.asarray([12]),
                       text=text, duration=jnp.asarray([40]), sampler=sampler,
                       seeds=jnp.asarray([3]))
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager), atol=1e-5)


def test_cfg_cache_period(tiny_params):
    """Guidance caching: k=1 is the untouched default; k=2 runs (jitted),
    differs from always-refreshed but stays close (the null velocity is
    smooth); invalid combinations are rejected."""
    tiny_params, _ = tiny_params
    rng = np.random.default_rng(19)
    cond = jnp.asarray(rng.standard_normal((2, 40, TINY.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 20, (2, 12)), jnp.int32)
    kw = dict(cond=cond, cond_lens=jnp.asarray([12, 9]), text=text,
              duration=jnp.asarray([40, 33]), seeds=jnp.asarray([3, 4]))

    base = sample_cfm(tiny_params, TINY, sampler=SamplerConfig(steps=5), **kw)

    @jax.jit
    def f(cond, text, seeds):
        return sample_cfm(tiny_params, TINY, cond=cond, cond_lens=jnp.asarray([12, 9]),
                          text=text, duration=jnp.asarray([40, 33]),
                          sampler=SamplerConfig(steps=5, cfg_cache_period=2), seeds=seeds)

    cached = f(cond, text, jnp.asarray([3, 4]))  # 5 steps: 2 groups of 2 + 1 remainder
    assert bool(jnp.isfinite(cached).all())
    assert float(jnp.abs(cached - base).max()) > 0
    # the approximation is close at tiny scale (smooth null field)
    assert float(jnp.abs(cached - base).mean()) < 0.5 * float(jnp.abs(base).mean())

    with pytest.raises(ValueError):
        sample_cfm(tiny_params, TINY,
                   sampler=SamplerConfig(steps=4, cfg_cache_period=2, method="midpoint"), **kw)
    with pytest.raises(ValueError):
        sample_cfm(tiny_params, TINY,
                   sampler=SamplerConfig(steps=4, cfg_cache_period=2,
                                         cfg_interval=(0.0, 0.5)), **kw)


def test_bucketed_log_mel_invariant_to_bucket_size():
    """The shared host mel helper (engine ref-mels + training data pipeline)
    pads samples to a bucket so XLA compiles a bounded number of mel graphs;
    the returned frames must not depend on the bucket chosen, and must match
    the unpadded mel everywhere the analysis window doesn't cross the pad
    boundary (last 2 frames read zero-pad vs reflect-pad)."""
    import jax.numpy as jnp

    from f5tts_tpu.ops.mel import MelConfig, bucketed_log_mel, log_mel_spectrogram

    cfg = MelConfig()
    rng = np.random.default_rng(11)
    wav = rng.standard_normal(12_345).astype(np.float32) * 0.1

    a = bucketed_log_mel(wav, cfg, bucket=32_768)
    b = bucketed_log_mel(wav, cfg, bucket=4_096)
    assert a.shape == (len(wav) // cfg.hop_length, cfg.n_mels)
    np.testing.assert_allclose(a, b, atol=1e-5)

    full = np.asarray(log_mel_spectrogram(jnp.asarray(wav[None]), cfg))[0]
    np.testing.assert_allclose(a[:-2], full[: a.shape[0] - 2], atol=1e-4)
