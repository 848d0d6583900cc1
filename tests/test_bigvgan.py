"""BigVGAN generator: shape/upsampling contract, finiteness, alias-free activation."""

import numpy as np

import jax
import jax.numpy as jnp

from f5tts_tpu.models.bigvgan import (
    _AA_FILTER,
    BigVGANConfig,
    _act,
    _downsample2,
    _snake_beta,
    _upsample2,
    bigvgan_decode,
    init_bigvgan,
)


def test_engine_with_bigvgan_vocoder():
    from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
    from f5tts_tpu.models.dit import DiTConfig, init_dit
    from f5tts_tpu.ops.mel import MelConfig
    from f5tts_tpu.sampling.euler import SamplerConfig
    from f5tts_tpu.text.tokenizer import Tokenizer

    bcfg = BigVGANConfig(
        mel_dim=20, upsample_initial_channel=32,
        upsample_rates=(4, 4, 4, 4), upsample_kernel_sizes=(8, 8, 8, 8),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )
    dit_cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
        text_num_embeds=120, text_dim=32, conv_layers=1, max_pos=512,
    )
    engine = TTSEngine(
        init_dit(jax.random.PRNGKey(0), dit_cfg), dit_cfg,
        init_bigvgan(jax.random.PRNGKey(1), bcfg),
        Tokenizer.from_texts(["bigvgan vocoder path."]),
        EngineConfig(
            mel=MelConfig(n_mels=20), vocoder_type="bigvgan", bigvgan=bcfg,
            sampler=SamplerConfig(steps=2), duration_buckets=(128,), text_pad=32,
            compute_dtype="float32",
        ),
    )
    ref = (np.random.default_rng(2).standard_normal(12000) * 0.1).astype(np.float32)
    wave, sr, _ = engine.synthesize("bigvgan path.", ref, 24000, "a ref.", seed=1)
    assert sr == 24000 and len(wave) > 1000 and np.all(np.isfinite(wave))


def test_bigvgan_shapes_and_finite():
    cfg = BigVGANConfig(
        mel_dim=20, upsample_initial_channel=64,
        upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        resblock_kernel_sizes=(3, 7), resblock_dilations=((1, 3), (1, 3)),
    )
    params = init_bigvgan(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 20)), jnp.float32)
    wave = bigvgan_decode(params, mel, cfg)
    assert wave.shape == (2, 16 * 4 * 4 * 2 * 2)
    assert bool(jnp.isfinite(wave).all())
    assert float(jnp.abs(wave).max()) <= 1.0


def _torch_activation1d(x_np, alpha_log, beta_log):
    """Independent torch reference for BigVGAN's alias-free Activation1d:
    replicate-pad(5) -> 2x conv_transpose(12-tap kaiser-sinc, gain 2) ->
    crop 15/15 -> snake-beta -> replicate-pad(5,6) -> stride-2 low-pass."""
    import torch
    import torch.nn.functional as F

    x = torch.tensor(x_np)  # (b, c, n)
    c = x.shape[1]
    f = torch.tensor(_AA_FILTER, dtype=torch.float64).view(1, 1, -1).expand(c, 1, -1)
    x = x.double()
    xp = F.pad(x, (5, 5), mode="replicate")
    up = 2.0 * F.conv_transpose1d(xp, f, stride=2, groups=c)
    up = up[..., 15:-15]
    a = torch.tensor(np.exp(alpha_log), dtype=torch.float64).view(1, -1, 1)
    b = torch.tensor(np.exp(beta_log), dtype=torch.float64).view(1, -1, 1)
    y = up + (1.0 / (b + 1e-9)) * torch.sin(a * up) ** 2
    yp = F.pad(y, (5, 6), mode="replicate")
    return F.conv1d(yp, f, stride=2, groups=c).numpy()


def test_anti_aliased_activation_matches_torch_semantics():
    rng = np.random.default_rng(7)
    b, n, c = 2, 37, 5
    x = rng.standard_normal((b, n, c)).astype(np.float32)
    alpha_log = rng.standard_normal(c).astype(np.float32) * 0.3
    beta_log = rng.standard_normal(c).astype(np.float32) * 0.3

    ours = np.asarray(_act(jnp.asarray(x), jnp.asarray(alpha_log), jnp.asarray(beta_log), True))
    ref = _torch_activation1d(np.transpose(x, (0, 2, 1)), alpha_log, beta_log)
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 1)), rtol=1e-5, atol=1e-5)


def test_upsample_downsample_roundtrip_on_bandlimited_signal():
    # A signal well below Nyquist should survive 2x up + 2x down nearly intact
    # (away from the replicate-padded edges).
    t = np.arange(256, dtype=np.float32)
    x = np.sin(2 * np.pi * 0.05 * t).reshape(1, -1, 1)
    y = np.asarray(_downsample2(_upsample2(jnp.asarray(x))))
    assert y.shape == x.shape
    np.testing.assert_allclose(y[0, 16:-16, 0], x[0, 16:-16, 0], atol=2e-3)


def test_anti_aliasing_attenuates_snake_harmonics():
    # Near-Nyquist tone: snake's sin^2 doubles the frequency past Nyquist.
    # Direct snake aliases that energy back in-band; the AA path filters it.
    t = np.arange(512, dtype=np.float32)
    freq = 0.35  # sin^2 harmonic at 0.7 > 0.5 Nyquist -> aliases to 0.3
    x = jnp.asarray(np.sin(2 * np.pi * freq * t).reshape(1, -1, 1), jnp.float32)
    zero = jnp.zeros((1,), jnp.float32)

    def alias_energy(y):
        spec = np.abs(np.fft.rfft(np.asarray(y)[0, 64:-64, 0] - np.mean(np.asarray(y)[0, 64:-64, 0])))
        freqs = np.fft.rfftfreq(len(np.asarray(y)[0, 64:-64, 0]))
        band = (freqs > 0.27) & (freqs < 0.33)  # the aliased image of 2*0.35
        return float(spec[band].max())

    direct = _snake_beta(x, zero, zero)
    aa = _act(x, zero, zero, True)
    assert alias_energy(aa) < 0.35 * alias_energy(direct)


def test_bigvgan_converter_and_decode_torch_golden():
    """Full-generator golden: an independent torch implementation of the
    BigVGAN topology (conv_pre -> [convT + AMP resblock fusion]* -> AA snake ->
    conv_post -> tanh) vs convert_bigvgan + bigvgan_decode."""
    import torch
    import torch.nn.functional as F

    cfg = BigVGANConfig(
        mel_dim=8, upsample_initial_channel=16,
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )
    gen = torch.Generator().manual_seed(0)

    def t_rand(*shape, scale=0.2):
        return (torch.randn(*shape, generator=gen, dtype=torch.float64) * scale)

    sd = {"conv_pre.weight": t_rand(16, 8, 7), "conv_pre.bias": t_rand(16),
          "conv_post.weight": t_rand(1, 4, 7), "conv_post.bias": t_rand(1),
          "activation_post.act.alpha": t_rand(1, 4, 1), "activation_post.act.beta": t_rand(1, 4, 1)}
    chans = [16, 8, 4]
    for i in range(2):
        cin, cout = chans[i], chans[i + 1]
        sd[f"ups.{i}.0.weight"] = t_rand(cin, cout, 4)
        sd[f"ups.{i}.0.bias"] = t_rand(cout)
        r = f"resblocks.{i}"
        for d in range(2):
            sd[f"{r}.convs1.{d}.weight"] = t_rand(cout, cout, 3)
            sd[f"{r}.convs1.{d}.bias"] = t_rand(cout)
            sd[f"{r}.convs2.{d}.weight"] = t_rand(cout, cout, 3)
            sd[f"{r}.convs2.{d}.bias"] = t_rand(cout)
            for a in range(2):
                sd[f"{r}.activations.{2 * d + a}.act.alpha"] = t_rand(1, cout, 1)
                sd[f"{r}.activations.{2 * d + a}.act.beta"] = t_rand(1, cout, 1)

    filt = torch.tensor(_AA_FILTER, dtype=torch.float64).view(1, 1, -1)

    def aa_snake(x, alpha, beta):  # x: (b, c, n)
        c = x.shape[1]
        f = filt.expand(c, 1, -1)
        up = 2.0 * F.conv_transpose1d(F.pad(x, (5, 5), mode="replicate"), f, stride=2, groups=c)
        up = up[..., 15:-15]
        a, b_ = torch.exp(alpha), torch.exp(beta)
        y = up + (1.0 / (b_ + 1e-9)) * torch.sin(a * up) ** 2
        return F.conv1d(F.pad(y, (5, 6), mode="replicate"), f, stride=2, groups=c)

    def torch_decode(mel):  # (b, n, m) -> (b, 4n)
        x = mel.transpose(1, 2).double()
        x = F.conv1d(x, sd["conv_pre.weight"], sd["conv_pre.bias"], padding=3)
        for i, (r_, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            x = F.conv_transpose1d(x, sd[f"ups.{i}.0.weight"], sd[f"ups.{i}.0.bias"],
                                   stride=r_, padding=(k - r_) // 2)
            rb = f"resblocks.{i}"
            y = x
            for d, dil in enumerate(cfg.resblock_dilations[0]):
                h = aa_snake(y, sd[f"{rb}.activations.{2 * d}.act.alpha"], sd[f"{rb}.activations.{2 * d}.act.beta"])
                h = F.conv1d(h, sd[f"{rb}.convs1.{d}.weight"], sd[f"{rb}.convs1.{d}.bias"],
                             padding=dil, dilation=dil)
                h = aa_snake(h, sd[f"{rb}.activations.{2 * d + 1}.act.alpha"], sd[f"{rb}.activations.{2 * d + 1}.act.beta"])
                h = F.conv1d(h, sd[f"{rb}.convs2.{d}.weight"], sd[f"{rb}.convs2.{d}.bias"], padding=1)
                y = y + h
            x = y  # single resblock kernel size -> fusion avg is identity
        x = aa_snake(x, sd["activation_post.act.alpha"], sd["activation_post.act.beta"])
        x = F.conv1d(x, sd["conv_post.weight"], sd["conv_post.bias"], padding=3)
        return torch.clamp(torch.tanh(x), -1.0, 1.0)[:, 0, :]

    from f5tts_tpu.models.bigvgan import convert_bigvgan

    params = convert_bigvgan({k: v.numpy() for k, v in sd.items()}, cfg)
    mel = torch.randn(2, 12, 8, generator=gen, dtype=torch.float64) * 0.5
    ours = np.asarray(bigvgan_decode(params, jnp.asarray(mel.numpy(), jnp.float32), cfg))
    ref = torch_decode(mel).numpy()
    assert ours.shape == ref.shape == (2, 48)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
