"""BigVGAN-class GAN vocoder (optional second vocoder).

The reference loads ``nvidia/bigvgan_v2_24khz_100band_256x`` from an external
package (``infer/utils_infer.py:116-129``); this is a native JAX
implementation of the generator topology for that config:

- conv_pre k=7 -> 6 transposed-conv upsample stages (rates 4,4,2,2,2,2,
  channels 1536 -> 24) each followed by a multi-receptive-field fusion of 3
  AMP resblocks (kernel sizes 3/7/11, dilations 1/3/5), snake-beta activations
  (``x + (1/(b+eps)) sin^2(a x)`` with log-scale alpha/beta), conv_post k=7,
  tanh.

Every snake is anti-aliased (``Activation1d``): 2x Kaiser-windowed-sinc
upsample -> snake at the doubled rate -> 2x low-pass downsample, so the
``sin^2`` harmonics above Nyquist are filtered instead of aliasing back into
band. Here the fixed 12-tap resampling filters are baked in as *polyphase
shifted-slice sums* (static slices + weighted adds, which XLA fuses into the
surrounding elementwise ops) rather than grouped/transposed convs — the
depthwise form can't use the MXU anyway and grouped convs misbehave under
GSPMD (see models/modules.py:conv1d). Main transposed convs are expressed
with ``lax.conv_transpose`` (XLA lowers them onto the MXU as strided convs).
Set ``anti_aliased=False`` for plain (v1-kernel-free) snake behavior.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

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
    anti_aliased: bool = True


def _snake_beta(x, alpha_log, beta_log):
    a = jnp.exp(alpha_log.astype(x.dtype))
    b = jnp.exp(beta_log.astype(x.dtype))
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(a * x))


# --- alias-free activation plumbing -----------------------------------------
# BigVGAN's Activation1d = UpSample1d(2) -> act -> DownSample1d(2) with a
# Kaiser-windowed sinc low-pass (cutoff 0.25, transition half-width 0.3,
# 12 taps for ratio 2). The filter is a fixed buffer, not a learned weight.

_AA_RATIO = 2
_AA_TAPS = 12  # int(6 * ratio // 2) * 2


def _kaiser_sinc_filter(cutoff: float, half_width: float, taps: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass, normalized to unit DC gain."""
    half_size = taps // 2
    delta_f = 4.0 * half_width
    attenuation = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if attenuation > 50.0:
        beta = 0.1102 * (attenuation - 8.7)
    elif attenuation >= 21.0:
        beta = 0.5842 * (attenuation - 21.0) ** 0.4 + 0.07886 * (attenuation - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(taps, beta)
    time = np.arange(taps) - half_size + (0.5 if taps % 2 == 0 else 0.0)
    f = 2.0 * cutoff * window * np.sinc(2.0 * cutoff * time)
    return (f / f.sum()).astype(np.float32)


_AA_FILTER = _kaiser_sinc_filter(0.5 / _AA_RATIO, 0.6 / _AA_RATIO, _AA_TAPS)


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """(b, n, c) -> (b, 2n, c) sinc interpolation.

    Polyphase form of replicate-pad(5) -> conv_transpose(stride 2, 12 taps,
    gain 2) -> crop 15/15: each output parity is a 6-tap FIR over the padded
    input, interleaved.
    """
    b, n, c = x.shape
    xp = jnp.pad(x, ((0, 0), (5, 5), (0, 0)), mode="edge")
    f = 2.0 * _AA_FILTER
    even = sum(float(f[e]) * xp[:, (15 - e) // 2 : (15 - e) // 2 + n] for e in range(1, _AA_TAPS, 2))
    odd = sum(float(f[e]) * xp[:, (16 - e) // 2 : (16 - e) // 2 + n] for e in range(0, _AA_TAPS, 2))
    return jnp.stack([even, odd], axis=2).reshape(b, 2 * n, c)


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """(b, 2n, c) -> (b, n, c) low-pass decimation (replicate pad 5/6, stride 2)."""
    n2 = x.shape[1]
    n = n2 // 2
    xp = jnp.pad(x, ((0, 0), (5, 6), (0, 0)), mode="edge")
    return sum(float(_AA_FILTER[e]) * xp[:, e : e + 2 * n : 2] for e in range(_AA_TAPS))


def _act(x, alpha_log, beta_log, anti_aliased: bool):
    if not anti_aliased:
        return _snake_beta(x, alpha_log, beta_log)
    return _downsample2(_snake_beta(_upsample2(x), alpha_log, beta_log))


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


def _amp_block(p, x, k: int, dilations, anti_aliased: bool):
    for i, dil in enumerate(dilations):
        h = _act(x, p["alpha1"][i], p["beta1"][i], anti_aliased)
        pad = (k - 1) * dil // 2
        h = m.conv1d(p["convs1"][i], h, padding=pad, dilation=dil)
        h = _act(h, p["alpha2"][i], p["beta2"][i], anti_aliased)
        h = m.conv1d(p["convs2"][i], h, padding=(k - 1) // 2)
        x = x + h
    return x


def _conv_transpose1d(p, x, stride: int, kernel: int):
    """channel-last transposed conv with torch-compatible 'same-ish' padding
    (pad = (kernel - stride) // 2 cropped from both ends).

    NOTE on kernel layout: ``lax.conv_transpose`` correlates (no kernel flip)
    while torch's ConvTranspose1d convolves; ``p['w']`` must therefore hold
    the torch kernel **flipped along time** — ``convert_bigvgan`` does this.
    (Random init is flip-invariant.)"""
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
            y = _amp_block(params["resblocks"][i][j], x, rk, cfg.resblock_dilations[j], cfg.anti_aliased)
            acc = y if acc is None else acc + y
        x = acc / len(cfg.resblock_kernel_sizes)
    x = _act(x, params["alpha_post"], params["beta_post"], cfg.anti_aliased)
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
        # torch ConvTranspose1d weight: (in, out, k) -> WIO (k, in, out),
        # flipped along time (torch convolves; lax.conv_transpose correlates)
        w = np.asarray(sd[f"{prefix}.weight"]).transpose(2, 0, 1)[::-1]
        return {"w": np.ascontiguousarray(w), "b": sd[f"{prefix}.bias"]}

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
