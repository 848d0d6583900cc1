"""Ring attention (context parallel) == single-device SDPA, on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from f5tts_tpu.ops.attention import sdpa_xla
from f5tts_tpu.parallel.ring_attention import cp_sharded, ring_attention

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")


@pytest.mark.slow
def test_dit_forward_with_ring_attention():
    """attn_impl='ring' under an ambient cp mesh == plain XLA forward."""
    import dataclasses

    from f5tts_tpu.models.dit import DiTConfig, dit_forward, init_dit

    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
        text_num_embeds=30, text_dim=32, conv_layers=1, max_pos=256,
    )
    params = init_dit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, n = 2, 64
    x = jnp.asarray(rng.standard_normal((b, n, 20)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 30, (b, 16)), jnp.int32)
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    f = jnp.zeros((b,), bool)
    mask = jnp.asarray(np.arange(n)[None, :] < np.asarray([64, 48])[:, None])

    ref = np.asarray(dit_forward(params, cfg, x, x, text, t, f, f, mask))

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("cp",))
    cfg_ring = dataclasses.replace(cfg, attn_impl="ring")
    with jax.sharding.set_mesh(mesh):
        out = np.asarray(dit_forward(params, cfg_ring, x, x, text, t, f, f, mask))
    valid = np.asarray(mask)
    for bi in range(b):
        np.testing.assert_allclose(out[bi][valid[bi]], ref[bi][valid[bi]], atol=3e-4, rtol=1e-3)


@pytest.mark.slow
def test_cp_sampling_end_to_end():
    """Full ODE sampling with context-parallel attention matches single-device."""
    import dataclasses

    from f5tts_tpu.models.dit import DiTConfig, init_dit
    from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm

    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
        text_num_embeds=30, text_dim=32, conv_layers=1, max_pos=512,
    )
    params = init_dit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.standard_normal((1, 128, 20)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 30, (1, 40)), jnp.int32)
    kw = dict(
        cond=cond, cond_lens=jnp.asarray([32]), text=text, duration=jnp.asarray([128]),
        sampler=SamplerConfig(steps=2), seeds=jnp.asarray([11]),
    )
    ref = np.asarray(sample_cfm(params, cfg, **kw))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("cp",))
    with jax.sharding.set_mesh(mesh):
        out = np.asarray(sample_cfm(params, dataclasses.replace(cfg, attn_impl="ring"), **kw))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("with_mask", [False, True])
def test_ring_attention_matches_sdpa(with_mask):
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("cp",))
    rng = np.random.default_rng(0)
    b, h, n, d = 2, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    mask = None
    if with_mask:
        m = np.ones((b, n), bool)
        m[0, 40:] = False
        m[1, 50:] = False
        mask = jnp.asarray(m)

    ref = np.asarray(sdpa_xla(q, k, v, mask))

    sh = cp_sharded(mesh)
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))
    with mesh:
        out = np.asarray(ring_attention(qs, ks, vs, mask, mesh))

    if with_mask:
        valid = np.asarray(mask)
        for bi in range(b):
            np.testing.assert_allclose(out[bi, :, valid[bi]], ref[bi, :, valid[bi]], atol=2e-5, rtol=1e-5)
    else:
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
