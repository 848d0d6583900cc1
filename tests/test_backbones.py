"""UNetT and MMDiT torch-golden parity + sampler integration."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import torch_ref as tr
from f5tts_tpu.models.mmdit import MMDiTConfig, init_mmdit, mmdit_forward
from f5tts_tpu.models.unett import UNetTConfig, init_unett, unett_forward

UCFG = UNetTConfig(
    dim=64, depth=4, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
    text_num_embeds=30, text_dim=32, conv_layers=1, max_pos=256,
)
MCFG = MMDiTConfig(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2, mel_dim=20, text_num_embeds=30)


def _inputs(b=2, n=36, nt=14, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, n, 20)).astype(np.float32)
    cond = rng.standard_normal((b, n, 20)).astype(np.float32)
    text = rng.integers(0, 30, (b, nt)).astype(np.int32)
    text[1, 9:] = -1
    time = np.asarray([0.2, 0.8], np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 28:] = False
    return x, cond, text, time, mask


def test_unett_forward_parity():
    params = init_unett(jax.random.PRNGKey(0), UCFG)
    np_params = jax.tree.map(np.asarray, params)
    x, cond, text, time, mask = _inputs()
    cfg_dict = {"dim_head": UCFG.dim_head, "heads": UCFG.heads, "text_dim": UCFG.text_dim, "max_pos": UCFG.max_pos}
    for drop_a, drop_t in [(False, False), (True, True)]:
        ours = np.asarray(
            unett_forward(
                params, UCFG, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text), jnp.asarray(time),
                jnp.full((2,), drop_a), jnp.full((2,), drop_t), jnp.asarray(mask),
            )
        )
        ref = tr.unett_forward(
            np_params, cfg_dict, torch.from_numpy(x), torch.from_numpy(cond),
            torch.from_numpy(text).long(), torch.from_numpy(time), drop_a, drop_t, torch.from_numpy(mask),
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


def test_mmdit_forward_parity():
    params = init_mmdit(jax.random.PRNGKey(1), MCFG)
    np_params = jax.tree.map(np.asarray, params)
    x, cond, text, time, mask = _inputs(nt=12)
    cfg_dict = {"dim_head": MCFG.dim_head, "heads": MCFG.heads, "dim": MCFG.dim, "text_max_pos": MCFG.text_max_pos}
    for drop_a, drop_t in [(False, False), (True, True)]:
        ours = np.asarray(
            mmdit_forward(
                params, MCFG, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text), jnp.asarray(time),
                jnp.full((2,), drop_a), jnp.full((2,), drop_t), jnp.asarray(mask),
            )
        )
        ref = tr.mmdit_forward(
            np_params, cfg_dict, torch.from_numpy(x), torch.from_numpy(cond),
            torch.from_numpy(text).long(), torch.from_numpy(time), drop_a, drop_t, torch.from_numpy(mask),
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


def test_unett_in_sampler():
    from f5tts_tpu.models.unett import unett_embed
    from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm

    params = init_unett(jax.random.PRNGKey(0), UCFG)
    rng = np.random.default_rng(2)
    cond = jnp.asarray(rng.standard_normal((1, 48, 20)), jnp.float32)
    out = sample_cfm(
        params, UCFG, cond=cond, cond_lens=jnp.asarray([16]),
        text=jnp.asarray(rng.integers(0, 30, (1, 20)), jnp.int32),
        duration=jnp.asarray([48]), sampler=SamplerConfig(steps=2),
        seeds=jnp.asarray([0]), forward_fn=unett_forward, embed_fn=unett_embed,
    )
    assert out.shape == (1, 48, 20)
    assert bool(jnp.isfinite(out).all())


def test_unett_flash_pad_matches_xla():
    """The time token makes UNetT's sequence n+1; the flash path pads to the
    next 128 multiple with masked keys (round-3 E2TTS geometry fix) — flash
    (interpret) must equal the XLA path for masked and unmasked rows."""
    import dataclasses

    from f5tts_tpu.models.unett import UNetTConfig, init_unett, unett_forward

    cfg_x = UNetTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=12,
                        text_num_embeds=24, text_dim=32, conv_layers=1, attn_impl="xla")
    cfg_f = dataclasses.replace(cfg_x, attn_impl="flash")
    params = init_unett(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.default_rng(0)
    b, n = 2, 128  # n+1 = 129 -> flash pads to 256
    x = jnp.asarray(rng.standard_normal((b, n, 12)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, n, 12)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 24, (b, 16)), jnp.int32)
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    drop = jnp.asarray([False, True])
    for mask in (None, jnp.asarray(np.arange(n)[None, :] < np.array([[n], [n - 40]])[:, 0, None])):
        ox = unett_forward(params, cfg_x, x, cond, text, t, drop, drop, mask)
        of = unett_forward(params, cfg_f, x, cond, text, t, drop, drop, mask)
        assert ox.shape == of.shape == (b, n, 12)
        valid = np.ones((b, n), bool) if mask is None else np.asarray(mask)
        np.testing.assert_allclose(np.asarray(ox)[valid], np.asarray(of)[valid], atol=2e-5)
