"""Ring attention (context parallel) == single-device SDPA, on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from f5tts_tpu.ops.attention import sdpa_xla
from f5tts_tpu.parallel.ring_attention import cp_sharded, ring_attention

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")


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
