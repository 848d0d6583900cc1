"""Int8 W8A8 serving path: numerical closeness to the fp model."""

import numpy as np

import jax
import jax.numpy as jnp

from f5tts_tpu.models import modules as m
from f5tts_tpu.models.dit import DiTConfig, dit_forward, init_dit, quantize_dit_params

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
    text_num_embeds=30, text_dim=32, conv_layers=1, max_pos=256,
)


def test_linear_int8_close_to_fp():
    rng = np.random.default_rng(0)
    p = m.init_linear(jax.random.PRNGKey(0), 256, 512)
    x = jnp.asarray(rng.standard_normal((4, 33, 256)), jnp.float32)
    y_fp = m.linear(p, x)
    y_q = m.linear(m.quantize_linear_params(p), x)
    rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
    assert rel < 0.02, rel


def test_quantized_dit_forward_close():
    params = init_dit(jax.random.PRNGKey(0), TINY)
    qparams = quantize_dit_params(params)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, TINY.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 20, (2, 10)), jnp.int32)
    t = jnp.asarray([0.4, 0.6], jnp.float32)
    f = jnp.zeros((2,), bool)

    y_fp = np.asarray(dit_forward(params, TINY, x, x, text, t, f, f))
    y_q = np.asarray(dit_forward(qparams, TINY, x, x, text, t, f, f))
    rel = np.linalg.norm(y_q - y_fp) / np.linalg.norm(y_fp)
    cos = float(np.sum(y_q * y_fp) / (np.linalg.norm(y_q) * np.linalg.norm(y_fp)))
    assert rel < 0.1, rel
    assert cos > 0.995, cos
