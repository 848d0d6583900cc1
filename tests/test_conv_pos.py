"""Fused Pallas conv-position-embedding vs the XLA grouped reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from f5tts_tpu.models import modules as m


def _params(key, dim):
    return m.init_conv_pos_embedding(key, dim)


@pytest.mark.slow
def test_fused_conv_pos_matches_xla():
    dim, groups = 128, 16
    p = _params(jax.random.PRNGKey(0), dim)
    rng = np.random.default_rng(1)
    for n in (64, 96, 256):
        x = jnp.asarray(rng.standard_normal((2, n, dim)), jnp.float32)
        mask = np.ones((2, n), bool)
        mask[1, n // 2 :] = False
        ref = m.conv_pos_embedding(p, x, jnp.asarray(mask), impl="xla")
        out = m.conv_pos_embedding(p, x, jnp.asarray(mask), impl="fused")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_fused_conv_pos_tiled_long_row():
    # n=2048 forces the tiled path (two 1024-frame tiles per conv)
    dim = 64
    p = _params(jax.random.PRNGKey(2), dim)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 2048, dim)), jnp.float32)
    ref = m.conv_pos_embedding(p, x, impl="xla")
    out = m.conv_pos_embedding(p, x, impl="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_fused_conv_pos_gradients_match_xla():
    dim = 64
    p = _params(jax.random.PRNGKey(4), dim)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 64, dim)), jnp.float32)

    def loss(impl):
        def f(p, x):
            return jnp.sum(jnp.square(m.conv_pos_embedding(p, x, impl=impl)))
        return jax.grad(f, argnums=(0, 1))(p, x)

    g_ref, gx_ref = loss("xla")
    g_fused, gx_fused = loss("fused")
    np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref), atol=1e-4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_densified_weights_keep_working():
    # old checkpoints/users may carry densified conv-pos weights: the fused
    # guard must skip them and the XLA dense path must still be exact
    dim = 64
    p = _params(jax.random.PRNGKey(6), dim)
    dense = {
        "conv1": m.densify_grouped_conv(p["conv1"], 16),
        "conv2": m.densify_grouped_conv(p["conv2"], 16),
    }
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 64, dim)), jnp.float32)
    ref = m.conv_pos_embedding(p, x, impl="xla")
    out = m.conv_pos_embedding(dense, x, impl="fused")  # guard falls through
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_pick_tile_caps_wide_rows():
    """n >= 4096 must use <=512-wide tiles: the 1024 tile's im2col buffers +
    whole-row VMEM blocks crash the Mosaic compile at the 4096 serving bucket
    (round-3 finding; BENCH.md solve-grid notes)."""
    from f5tts_tpu.ops.pallas.conv_pos import pick_tile

    assert pick_tile(4096) == 512
    assert pick_tile(8192) == 512
    assert pick_tile(2048) == 1024  # smaller buckets keep the wide tiles
    assert pick_tile(3072) == 1024
