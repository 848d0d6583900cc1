"""BigVGAN generator: shape/upsampling contract and finiteness."""

import numpy as np

import jax
import jax.numpy as jnp

from f5tts_tpu.models.bigvgan import BigVGANConfig, bigvgan_decode, init_bigvgan


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
