"""BigVGAN generator: shape/upsampling contract and finiteness."""

import numpy as np

import jax
import jax.numpy as jnp

from f5tts_tpu.models.bigvgan import BigVGANConfig, bigvgan_decode, init_bigvgan


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
