"""Vocos-class neural vocoder: ConvNeXt backbone + ISTFT head, in JAX.

The reference consumes the external ``vocos`` package
(``infer/utils_infer.py:92-115``, checkpoint ``charactr/vocos-mel-24khz``); the
network itself is re-implemented here natively:

- backbone: Conv1d(k=7) embed -> LayerNorm -> N x ConvNeXt-v1 blocks (depthwise
  k=7, LN, pw 512->1536, GELU, pw 1536->512, layer-scale gamma) -> final LN.
- head: Linear(dim -> n_fft + 2) -> split into log-magnitude and phase ->
  ``exp(clip(mag)) * exp(i phase)`` -> iSTFT (``f5tts_tpu.ops.stft``).

``convert_vocos_torch_state_dict`` maps the published torch checkpoint layout
onto these pytrees. All APIs are frame-major ``(b, n, mel)``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from f5tts_tpu.models import modules as m
from f5tts_tpu.ops.stft import istft_reim


@dataclass(frozen=True)
class VocosConfig:
    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    mag_clip: float = 1e2

    @property
    def head_out(self) -> int:
        return self.n_fft + 2


def init_vocos(key: jax.Array, cfg: VocosConfig = VocosConfig()):
    ks = jax.random.split(key, cfg.num_layers + 4)
    blocks = []
    for i in range(cfg.num_layers):
        kk = jax.random.split(ks[i], 3)
        blocks.append(
            {
                "dwconv": m.init_conv1d(kk[0], cfg.dim, cfg.dim, 7, groups=cfg.dim),
                "norm_w": jnp.ones((cfg.dim,)),
                "norm_b": jnp.zeros((cfg.dim,)),
                "pw1": m.init_linear(kk[1], cfg.dim, cfg.intermediate_dim),
                "pw2": m.init_linear(kk[2], cfg.intermediate_dim, cfg.dim),
                "gamma": jnp.full((cfg.dim,), 1.0 / cfg.num_layers),
            }
        )
    return {
        "embed": m.init_conv1d(ks[-4], cfg.input_channels, cfg.dim, 7),
        "norm_w": jnp.ones((cfg.dim,)),
        "norm_b": jnp.zeros((cfg.dim,)),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_norm_w": jnp.ones((cfg.dim,)),
        "final_norm_b": jnp.zeros((cfg.dim,)),
        "head": m.init_linear(ks[-3], cfg.dim, cfg.head_out),
    }


def _convnext_v1_block(p, x):
    h = m.conv1d(p["dwconv"], x, groups=x.shape[-1], padding=3)
    h = m.layer_norm(h, 1e-6, p["norm_w"], p["norm_b"])
    h = m.linear(p["pw1"], h)
    h = jax.nn.gelu(h, approximate=False)
    h = m.linear(p["pw2"], h)
    return x + p["gamma"].astype(h.dtype) * h


def vocos_decode(params, mel: jnp.ndarray, cfg: VocosConfig = VocosConfig(), compute_dtype=jnp.float32) -> jnp.ndarray:
    """Log-mel ``(b, n, mel)`` -> waveform ``(b, (n-1)*hop)``."""
    x = mel.astype(compute_dtype)
    x = m.conv1d(params["embed"], x, padding=3)
    x = m.layer_norm(x, 1e-6, params["norm_w"], params["norm_b"])

    def body(carry, blk):
        return _convnext_v1_block(blk, carry), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = m.layer_norm(x, 1e-6, params["final_norm_w"], params["final_norm_b"])
    x = m.linear(params["head"], x).astype(jnp.float32)

    n_freq = cfg.n_fft // 2 + 1
    mag, phase = x[..., :n_freq], x[..., n_freq:]
    mag = jnp.exp(jnp.clip(mag, max=math.log(cfg.mag_clip)))
    return istft_reim(mag * jnp.cos(phase), mag * jnp.sin(phase), cfg.n_fft, cfg.hop_length, cfg.n_fft, center=True)
