"""Pallas fused W8A8 matmul (interpret mode) vs reference quantized math."""

import numpy as np

import jax.numpy as jnp

from f5tts_tpu.ops.pallas.quant_matmul import quant_matmul


def test_quant_matmul_matches_dense():
    rng = np.random.default_rng(0)
    M, K, N = 256, 128, 256
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = rng.standard_normal((K, N)).astype(np.float32)
    sw = np.abs(w).max(0) / 127.0
    wq = jnp.asarray(np.clip(np.round(w / sw), -127, 127), jnp.int8)

    out = np.asarray(quant_matmul(x, wq, jnp.asarray(sw), block_m=128, block_n=128, interpret=True))
    ref = np.asarray(x) @ w
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_quant_matmul_odd_shape_fallback():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((100, 64)), jnp.float32)
    w = rng.standard_normal((64, 96)).astype(np.float32)
    sw = np.abs(w).max(0) / 127.0
    wq = jnp.asarray(np.clip(np.round(w / sw), -127, 127), jnp.int8)
    out = np.asarray(quant_matmul(x, wq, jnp.asarray(sw), interpret=True))
    ref = np.asarray(x) @ w
    assert np.linalg.norm(out - ref) / np.linalg.norm(ref) < 0.02
