"""BigVGAN-class GAN vocoder (optional second vocoder).

The reference loads ``nvidia/bigvgan_v2_24khz_100band_256x`` from an external
package (``infer/utils_infer.py:116-129``); this is a native JAX
implementation of the generator topology for that config:

- conv_pre k=7 -> 6 transposed-conv upsample stages (rates 4,4,2,2,2,2,
  channels 1536 -> 24) each followed by a multi-receptive-field fusion of 3
  AMP resblocks (kernel sizes 3/7/11, dilations 1/3/5), snake-beta activations
  (``x + (1/(b+eps)) sin^2(a x)`` with log-scale alpha/beta), conv_post k=7,
  tanh.

Deviation, documented: BigVGAN-v2's anti-aliased activation (2x up/downsample
low-pass around each snake) is omitted — activations apply directly. Weight
conversion therefore targets v1-style checkpoints exactly and v2 checkpoints
approximately. Transposed convs are expressed with
``lax.conv_transpose`` (XLA lowers them onto the MXU as strided convs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import lax

from f5tts_tpu.models import modules as m


@dataclass(frozen=True)
class BigVGANConfig:
    mel_dim: int = 100
    upsample_initial_channel: int = 1536
    upsample_rates: tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def _snake_beta(x, alpha_log, beta_log):
    a = jnp.exp(alpha_log.astype(x.dtype))
    b = jnp.exp(beta_log.astype(x.dtype))
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(a * x))


def _init_amp_block(key, ch: int, k: int, dilations):
    ks = jax.random.split(key, 2 * len(dilations) + 1)
    return {
        "convs1": [m.init_conv1d(ks[i], ch, ch, k) for i in range(len(dilations))],
        "convs2": [m.init_conv1d(ks[len(dilations) + i], ch, ch, k) for i in range(len(dilations))],
        "alpha1": [jnp.zeros((ch,)) for _ in dilations],
        "beta1": [jnp.zeros((ch,)) for _ in dilations],
        "alpha2": [jnp.zeros((ch,)) for _ in dilations],
        "beta2": [jnp.zeros((ch,)) for _ in dilations],
    }


def init_bigvgan(key: jax.Array, cfg: BigVGANConfig = BigVGANConfig()):
    ks = jax.random.split(key, 4 + len(cfg.upsample_rates))
    params = {
        "conv_pre": m.init_conv1d(ks[0], cfg.mel_dim, cfg.upsample_initial_channel, 7),
        "ups": [],
        "resblocks": [],  # list over stages; each stage a list over kernel sizes
        "alpha_post": jnp.zeros((cfg.upsample_initial_channel // (2 ** len(cfg.upsample_rates)),)),
        "beta_post": jnp.zeros((cfg.upsample_initial_channel // (2 ** len(cfg.upsample_rates)),)),
    }
    ch = cfg.upsample_initial_channel
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        kk = jax.random.split(ks[1 + i], 1 + len(cfg.resblock_kernel_sizes))
        ch_out = ch // 2
        params["ups"].append(m.init_conv1d(kk[0], ch, ch_out, k))
        params["resblocks"].append(
            [
                _init_amp_block(kk[1 + j], ch_out, rk, cfg.resblock_dilations[j])
                for j, rk in enumerate(cfg.resblock_kernel_sizes)
            ]
        )
        ch = ch_out
    params["conv_post"] = m.init_conv1d(ks[-1], ch, 1, 7)
    return params


def _amp_block(p, x, k: int, dilations):
    for i, dil in enumerate(dilations):
        h = _snake_beta(x, p["alpha1"][i], p["beta1"][i])
        pad = (k - 1) * dil // 2
        h = m.conv1d(p["convs1"][i], h, padding=pad, dilation=dil)
        h = _snake_beta(h, p["alpha2"][i], p["beta2"][i])
        h = m.conv1d(p["convs2"][i], h, padding=(k - 1) // 2)
        x = x + h
    return x


def _conv_transpose1d(p, x, stride: int, kernel: int):
    """channel-last transposed conv with torch-compatible 'same-ish' padding
    (pad = (kernel - stride) // 2 cropped from both ends)."""
    y = lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    crop = (kernel - stride) // 2
    if crop:
        y = y[:, crop:-crop]
    return y + p["b"].astype(x.dtype)


def bigvgan_decode(params, mel: jnp.ndarray, cfg: BigVGANConfig = BigVGANConfig(), compute_dtype=jnp.float32):
    """Log-mel ``(b, n, mel_dim)`` -> waveform ``(b, n * prod(rates))``."""
    x = m.conv1d(params["conv_pre"], mel.astype(compute_dtype), padding=3)
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = _conv_transpose1d(params["ups"][i], x, r, k)
        acc = None
        for j, rk in enumerate(cfg.resblock_kernel_sizes):
            y = _amp_block(params["resblocks"][i][j], x, rk, cfg.resblock_dilations[j])
            acc = y if acc is None else acc + y
        x = acc / len(cfg.resblock_kernel_sizes)
    x = _snake_beta(x, params["alpha_post"], params["beta_post"])
    x = m.conv1d(params["conv_post"], x, padding=3)
    return jnp.clip(jnp.tanh(x[..., 0]), -1.0, 1.0)


def convert_bigvgan(sd: dict, cfg: BigVGANConfig = BigVGANConfig()):
    """Map a BigVGAN torch state dict (weight-norm removed) onto these pytrees.

    Keys: ``conv_pre.weight/bias``, ``ups.{i}.0.weight/bias`` (ConvTranspose1d:
    (in, out, k) -> (k, in, out)... note transposed conv layout differs from
    Conv1d), ``resblocks.{i*3+j}.convs{1,2}.{k}.weight/bias``,
    ``resblocks.*.activations...alpha/beta``, ``conv_post``,
    ``activation_post.act.alpha/beta``.
    """
    import numpy as np

    def conv(prefix):
        return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 1, 0)), "b": sd[f"{prefix}.bias"]}

    def convT(prefix):
        # torch ConvTranspose1d weight: (in, out, k) -> WIO (k, in, out)
        return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 0, 1)), "b": sd[f"{prefix}.bias"]}

    params = {
        "conv_pre": conv("conv_pre"),
        "ups": [convT(f"ups.{i}.0") for i in range(len(cfg.upsample_rates))],
        "resblocks": [],
        "conv_post": conv("conv_post"),
        "alpha_post": sd["activation_post.act.alpha"].reshape(-1),
        "beta_post": sd["activation_post.act.beta"].reshape(-1),
    }
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        stage = []
        for j in range(nk):
            r = f"resblocks.{i * nk + j}"
            nd = len(cfg.resblock_dilations[j])
            stage.append(
                {
                    "convs1": [conv(f"{r}.convs1.{d}") for d in range(nd)],
                    "convs2": [conv(f"{r}.convs2.{d}") for d in range(nd)],
                    "alpha1": [sd[f"{r}.activations.{2 * d}.act.alpha"].reshape(-1) for d in range(nd)],
                    "beta1": [sd[f"{r}.activations.{2 * d}.act.beta"].reshape(-1) for d in range(nd)],
                    "alpha2": [sd[f"{r}.activations.{2 * d + 1}.act.alpha"].reshape(-1) for d in range(nd)],
                    "beta2": [sd[f"{r}.activations.{2 * d + 1}.act.beta"].reshape(-1) for d in range(nd)],
                }
            )
        params["resblocks"].append(stage)
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
