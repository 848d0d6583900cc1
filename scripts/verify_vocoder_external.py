"""ONE-TIME external vocoder verification (run in an egress-enabled env).

Standing caveat (PARITY.md): this repo's Vocos/BigVGAN numerics are pinned
against ``tests/torch_ref.py`` — our own torch restatement of the upstream
nets — because neither the ``vocos`` package nor the BigVGAN repo exists in
the build image (zero egress). Operator-level pins (torch.istft golden,
snake semantics, kernel time-flip) bound the residual risk to a semantic
mismatch in the restatement itself.

This script closes that gap wherever the real packages CAN be installed:

    pip install vocos==0.1.0 torch
    git clone https://github.com/NVIDIA/BigVGAN && pip install -e BigVGAN
    python scripts/verify_vocoder_external.py --which vocos \
        --ckpt charactr/vocos-mel-24khz
    python scripts/verify_vocoder_external.py --which bigvgan \
        --ckpt nvidia/bigvgan_v2_24khz_100band_256x

For each vocoder it:
  1. loads the REAL upstream checkpoint through the REAL upstream code,
  2. converts the same weights with this repo's converter
     (``models/convert.py:convert_vocos`` / ``models/bigvgan.py``),
  3. runs both on the same mel batch and reports max|Δ| / rel-L2,
  4. exits nonzero if rel-L2 > 1e-4 (f32).

Reference loading contract being verified:
``/root/reference/src/server/f5_tts/infer/utils_infer.py:92-130`` (vocos
from_hparams/from_pretrained + BigVGAN remote code path).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _fail(msg):
    print(f"FAIL: {msg}")
    sys.exit(1)


def verify_vocos(ckpt: str, tol: float):
    try:
        import torch
        from vocos import Vocos  # the actual upstream package
    except ImportError as e:
        _fail(f"vocos/torch not installed (egress-enabled env required): {e}")

    import jax.numpy as jnp

    from f5tts_tpu.models.convert import convert_vocos
    from f5tts_tpu.models.vocos import VocosConfig, vocos_decode

    upstream = Vocos.from_pretrained(ckpt).eval()
    sd = {k: v.detach().cpu().numpy() for k, v in upstream.state_dict().items()}
    cfg = VocosConfig()
    params = convert_vocos(sd, cfg)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 64, cfg.input_channels)).astype(np.float32) * 1.5 - 1.0

    with torch.no_grad():
        ref = upstream.decode(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()
    ours = np.asarray(vocos_decode(params, jnp.asarray(mel), cfg))

    n = min(ref.shape[-1], ours.shape[-1])
    rel = np.linalg.norm(ours[..., :n] - ref[..., :n]) / max(np.linalg.norm(ref[..., :n]), 1e-9)
    print(f"vocos: max|d|={np.abs(ours[..., :n] - ref[..., :n]).max():.3e} relL2={rel:.3e}")
    if rel > tol:
        _fail(f"vocos rel-L2 {rel:.3e} > {tol}")


def verify_bigvgan(ckpt: str, tol: float):
    try:
        import torch
        from bigvgan import BigVGAN  # the actual upstream repo (NVIDIA/BigVGAN)
    except ImportError as e:
        _fail(f"BigVGAN/torch not installed (egress-enabled env required): {e}")

    import jax.numpy as jnp

    from f5tts_tpu.models.bigvgan import BigVGANConfig, bigvgan_decode, convert_bigvgan

    upstream = BigVGAN.from_pretrained(ckpt, use_cuda_kernel=False).eval()
    upstream.remove_weight_norm()
    sd = {k: v.detach().cpu().numpy() for k, v in upstream.state_dict().items()}
    cfg = BigVGANConfig()
    params = convert_bigvgan(sd, cfg)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 64, cfg.mel_dim)).astype(np.float32) * 1.5 - 1.0

    with torch.no_grad():
        ref = upstream(torch.from_numpy(mel.transpose(0, 2, 1))).squeeze(1).numpy()
    ours = np.asarray(bigvgan_decode(params, jnp.asarray(mel), cfg))

    n = min(ref.shape[-1], ours.shape[-1])
    rel = np.linalg.norm(ours[..., :n] - ref[..., :n]) / max(np.linalg.norm(ref[..., :n]), 1e-9)
    print(f"bigvgan: max|d|={np.abs(ours[..., :n] - ref[..., :n]).max():.3e} relL2={rel:.3e}")
    if rel > tol:
        _fail(f"bigvgan rel-L2 {rel:.3e} > {tol}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", choices=["vocos", "bigvgan", "both"], default="both")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--tol", type=float, default=1e-4)
    args = p.parse_args()
    if args.which in ("vocos", "both"):
        verify_vocos(args.ckpt or "charactr/vocos-mel-24khz", args.tol)
    if args.which in ("bigvgan", "both"):
        verify_bigvgan(args.ckpt or "nvidia/bigvgan_v2_24khz_100band_256x", args.tol)
    print("OK")


if __name__ == "__main__":
    main()
