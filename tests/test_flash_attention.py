"""Pallas flash attention vs XLA SDPA (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from f5tts_tpu.ops.attention import sdpa_xla
from f5tts_tpu.ops.pallas.flash_attention import flash_attention


@pytest.mark.parametrize("with_mask", [False, True])
def test_flash_attention_matches_sdpa(with_mask):
    rng = np.random.default_rng(0)
    b, h, n, d = 2, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    mask = None
    if with_mask:
        m = np.ones((b, n), bool)
        m[0, 300:] = False
        m[1, 450:] = False
        mask = jnp.asarray(m)

    ref = np.asarray(sdpa_xla(q, k, v, mask))
    out = np.asarray(flash_attention(q, k, v, mask, block_q=128, block_k=256, interpret=True))
    if with_mask:
        valid = np.asarray(mask)
        for bi in range(b):
            np.testing.assert_allclose(out[bi, :, valid[bi]], ref[bi, :, valid[bi]], atol=2e-5, rtol=1e-5)
    else:
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("n", [768, 1536])
def test_flash_attention_odd_buckets(n):
    rng = np.random.default_rng(2)
    b, h, d = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    m = np.ones((b, n), bool)
    m[0, n - 100 :] = False
    out = flash_attention(q, q, q, jnp.asarray(m), interpret=True)
    ref = sdpa_xla(q, q, q, jnp.asarray(m))
    np.testing.assert_allclose(
        np.asarray(out)[0, :, : n - 100], np.asarray(ref)[0, :, : n - 100], atol=2e-5, rtol=1e-5
    )


def test_flash_attention_odd_length_falls_back():
    rng = np.random.default_rng(1)
    b, h, n, d = 1, 2, 300, 64  # 300 not divisible by blocks -> xla fallback
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    out = flash_attention(q, q, q, None, interpret=True)
    ref = sdpa_xla(q, q, q, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_packed_head_pair_path_matches_sdpa():
    """Single-pass + even heads dispatches to the block-diagonal packed kernel
    (K=128 MXU contraction); must match SDPA including key-padding masks."""
    from f5tts_tpu.ops.attention import sdpa_xla

    rng = np.random.default_rng(8)
    b, h, n, d = 2, 4, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    mask = np.ones((b, n), bool)
    mask[0, 200:] = False
    mask[1, 100:] = False
    out = np.asarray(flash_attention(q, k, v, jnp.asarray(mask), interpret=True, packed=True))
    ref = np.asarray(sdpa_xla(q, k, v, jnp.asarray(mask)))
    np.testing.assert_allclose(out[mask[:, None, :, None] & np.ones((1, h, 1, d), bool)],
                               ref[mask[:, None, :, None] & np.ones((1, h, 1, d), bool)],
                               atol=2e-5, rtol=1e-5)

    # odd head count falls back to the per-head single-pass kernel and still matches
    out3 = np.asarray(flash_attention(q[:, :3], k[:, :3], v[:, :3], jnp.asarray(mask), interpret=True, packed=True))
    ref3 = np.asarray(sdpa_xla(q[:, :3], k[:, :3], v[:, :3], jnp.asarray(mask)))
    np.testing.assert_allclose(out3[mask[:, None, :, None] & np.ones((1, 3, 1, d), bool)],
                               ref3[mask[:, None, :, None] & np.ones((1, 3, 1, d), bool)],
                               atol=2e-5, rtol=1e-5)


def test_packed_multiblock_matches_sdpa():
    """Packed head-pair path with online softmax (block_k < n)."""
    from f5tts_tpu.ops.attention import sdpa_xla

    rng = np.random.default_rng(12)
    b, h, n, d = 2, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    mask = np.ones((b, n), bool)
    mask[0, 420:] = False
    out = np.asarray(flash_attention(q, k, v, jnp.asarray(mask),
                                     block_q=128, block_k=256, interpret=True, packed=True))
    ref = np.asarray(sdpa_xla(q, k, v, jnp.asarray(mask)))
    sel = mask[:, None, :, None] & np.ones((1, h, 1, d), bool)
    np.testing.assert_allclose(out[sel], ref[sel], atol=2e-5, rtol=1e-5)


def test_fused_rope_matches_external_rope():
    """rope_freqs passed into the kernel == roping q/k outside (head-0-only
    quirk and all-heads variants; single-pass and multi-block paths)."""
    from f5tts_tpu.ops.attention import sdpa_xla
    from f5tts_tpu.ops.rope import apply_rotary_per_head, rotary_freqs

    rng = np.random.default_rng(21)
    b, h, n, d = 2, 4, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    mask = np.ones((b, n), bool)
    mask[1, 180:] = False
    freqs = jnp.asarray(rotary_freqs(n, d))

    def rope_head0(t):
        return jnp.concatenate([apply_rotary_per_head(t[:, :1], freqs), t[:, 1:]], 1)

    for blocks in ({}, {"block_q": 128, "block_k": 128}):
        # head-0-only (reference quirk)
        out = flash_attention(q, k, v, jnp.asarray(mask), interpret=True,
                              rope_freqs=freqs, rope_all_heads=False, **blocks)
        ref = sdpa_xla(rope_head0(q), rope_head0(k), v, jnp.asarray(mask))
        sel = mask[:, None, :, None] & np.ones((1, h, 1, d), bool)
        np.testing.assert_allclose(np.asarray(out)[sel], np.asarray(ref)[sel], atol=3e-5, rtol=1e-4)

        # all-heads
        out = flash_attention(q, k, v, jnp.asarray(mask), interpret=True,
                              rope_freqs=freqs, rope_all_heads=True, **blocks)
        ref = sdpa_xla(apply_rotary_per_head(q, freqs), apply_rotary_per_head(k, freqs),
                       v, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(out)[sel], np.asarray(ref)[sel], atol=3e-5, rtol=1e-4)


def test_flash_train_gradients_match_sdpa():
    """Differentiable flash (custom-VJP fwd/bwd kernels) == XLA SDPA gradients."""
    from f5tts_tpu.ops.attention import sdpa_xla
    from f5tts_tpu.ops.pallas.flash_attention import flash_attention_train

    rng = np.random.default_rng(30)
    b, h, n, d = 2, 3, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    mask = np.ones((b, n), bool)
    mask[0, 200:] = False
    mj = jnp.asarray(mask)
    # query-side weighting zeroes padded rows so their (garbage) outputs
    # don't enter the loss — the caller's contract (modules.py:429-434)
    wq = jnp.asarray(mask, jnp.float32)[:, None, :, None]
    tgt = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(jnp.square((fn(q, k, v, mj) - tgt) * wq))
        return f

    o_flash = flash_attention_train(q, k, v, mj, interpret=True)
    o_ref = sdpa_xla(q, k, v, mj)
    sel = mask[:, None, :, None] & np.ones((1, h, 1, d), bool)
    np.testing.assert_allclose(np.asarray(o_flash)[sel], np.asarray(o_ref)[sel], atol=2e-5, rtol=1e-5)

    g_flash = jax.grad(loss(lambda *a: flash_attention_train(*a, interpret=True)), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(sdpa_xla), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_train_step_with_flash_attention():
    """A full CFM train step differentiates through the flash kernels."""
    import dataclasses

    from f5tts_tpu.models.cfm import CFMConfig, cfm_loss
    from f5tts_tpu.models.dit import DiTConfig, init_dit

    cfg = CFMConfig(model=DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=8,
        text_num_embeds=20, text_dim=16, conv_layers=1, max_pos=256, attn_impl="flash",
    ))
    params = init_dit(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, 128, 8)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 18, (2, 10)), jnp.int32)
    lens = jnp.full((2,), 128, jnp.int32)

    def f(p):
        return cfm_loss(p, cfg, jax.random.PRNGKey(2), mel, text, lens)[0]

    loss, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(loss))
    gnorm = float(sum(float(jnp.sum(jnp.square(g))) for g in jax.tree.leaves(grads)) ** 0.5)
    assert gnorm > 0 and np.isfinite(gnorm)

    # matches the xla-attention loss value (same forward math)
    cfg_x = CFMConfig(model=dataclasses.replace(cfg.model, attn_impl="xla"))
    loss_x = cfm_loss(params, cfg_x, jax.random.PRNGKey(2), mel, text, lens)[0]
    np.testing.assert_allclose(float(loss), float(loss_x), rtol=1e-4)
