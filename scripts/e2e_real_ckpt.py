"""Real-checkpoint end-to-end: full-size trainer ``.pt`` -> convert -> engine -> wav.

VERDICT round-3 missing-item #1: no real weight FILE had ever crossed the
full stack (the converters were pinned against instantiated modules). This
script synthesizes a FULL-SIZE F5TTS_Base torch checkpoint file with the
authentic trainer layout — ``model_state_dict`` + ``ema_model_state_dict``
(``ema_model.*`` keys, ``initted``/``step`` bookkeeping, the stale
``mel_spec.mel_stft.*`` buffers the loader must drop) exactly as
``/root/reference/src/server/f5_tts/model/trainer.py:139-143`` writes and
``infer/utils_infer.py:175-218`` reads — then runs this framework's real
loading path on it:

  f5tpu-convert (CLI) -> .npz -> TTSEngine -> synthesize -> wav

and asserts mel parity against the REFERENCE CFM loaded from the SAME file
(its own ``load_checkpoint`` + ``CFM.sample`` on CPU torch, small NFE so the
torch side stays tractable at 336M params).

Usage:
  python scripts/e2e_real_ckpt.py --platform tpu --dtype bf16   # chip run
  python scripts/e2e_real_ckpt.py --platform cpu --nfe 2 --bucket 256
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def make_checkpoint(path: str, seed: int = 0):
    """Instantiate the reference CFM at full F5TTS_Base geometry (random
    weights, seeded) and torch.save the authentic trainer checkpoint layout."""
    import torch

    from reference_runtime import load_reference

    ref = load_reference()
    torch.manual_seed(seed)
    transformer = ref.DiT(dim=1024, depth=22, heads=16, ff_mult=2,
                          text_dim=512, conv_layers=4, text_num_embeds=2545,
                          mel_dim=100)
    mel_kw = dict(n_fft=1024, hop_length=256, win_length=1024, n_mel_channels=100,
                  target_sample_rate=24_000, mel_spec_type="vocos")
    cfm = ref.CFM(transformer=transformer, mel_spec_kwargs=mel_kw)
    cfm.eval()

    sd = cfm.state_dict()
    # EMA weights differ from online weights (as they would after training):
    # perturb deterministically so a loader that grabs the WRONG dict fails
    # the parity assertion instead of silently passing.
    g = torch.Generator().manual_seed(seed + 1)
    ema_sd = {}
    for k, v in sd.items():
        if v.dtype.is_floating_point and not k.startswith("mel_spec."):
            ema_sd["ema_model." + k] = v + 1e-3 * torch.randn(v.shape, generator=g)
        else:
            ema_sd["ema_model." + k] = v  # incl. the stale mel_spec buffers
    ema_sd["initted"] = torch.tensor(True)
    ema_sd["step"] = torch.tensor(123_456)

    ckpt = {
        "model_state_dict": sd,
        "ema_model_state_dict": ema_sd,
        "scheduler_state_dict": {},
        "step": 123_456,
    }
    torch.save(ckpt, path)
    n_params = sum(v.numel() for k, v in sd.items()
                   if not k.startswith("mel_spec."))
    return cfm, ema_sd, n_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--nfe", type=int, default=4,
                   help="euler steps for the parity solve (torch at 336M is slow)")
    p.add_argument("--bucket", type=int, default=512)
    p.add_argument("--ckpt", default="/tmp/f5_base_e2e.pt")
    p.add_argument("--keep-ckpt", action="store_true")
    p.add_argument("--out", default="E2E_CKPT.json")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_matmul_precision", "highest")

    import torch

    import jax.numpy as jnp

    t0 = time.time()
    print("building full-size F5TTS_Base checkpoint (336M params)...", flush=True)
    cfm, ema_sd, n_params = make_checkpoint(args.ckpt)
    size_gb = os.path.getsize(args.ckpt) / 1e9
    print(f"  wrote {args.ckpt}: {n_params/1e6:.1f}M params, {size_gb:.2f} GB, "
          f"{time.time()-t0:.0f}s", flush=True)

    # --- the framework's real loading path: CLI convert -> npz -------------
    npz = args.ckpt.replace(".pt", ".npz")
    # vocab file sized to the checkpoint's text embedding (IndicF5 = 2545)
    vocab_path = args.ckpt.replace(".pt", "_vocab.txt")
    with open(vocab_path, "w") as f:
        f.write(" \n")
        for i in range(2544):
            f.write(f"tok{i}\n")
    t0 = time.time()
    subprocess.run([sys.executable, "-m", "f5tts_tpu.cli.convert",
                    "--ckpt", args.ckpt, "--model", "F5TTS_Base",
                    "--vocab", vocab_path, "--out", npz],
                   check=True, cwd=REPO,
                   env={**os.environ, "JAX_PLATFORMS": "cpu"})
    print(f"  f5tpu-convert -> {npz} ({time.time()-t0:.0f}s)", flush=True)

    # --- engine -> wav ------------------------------------------------------
    from f5tts_tpu.engine.engine import EngineConfig, RowSpec, TTSEngine
    from f5tts_tpu.models.convert import load_f5_checkpoint
    from f5tts_tpu.models.dit import DiTConfig
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos
    from f5tts_tpu.sampling.euler import SamplerConfig
    from f5tts_tpu.text.tokenizer import Tokenizer

    # IndicF5's real vocab size (2545), matching the synthesized checkpoint
    cfg = DiTConfig(**{**DiTConfig.base().__dict__, "text_num_embeds": 2545})
    params = load_f5_checkpoint(npz, cfg)
    n_loaded = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert n_loaded == n_params, (n_loaded, n_params)

    dtype = "float32" if args.dtype == "f32" else "bfloat16"
    engine = TTSEngine(
        params, cfg, init_vocos(jax.random.PRNGKey(1), VocosConfig()),
        Tokenizer.from_texts(["end to end checkpoint test"]),
        EngineConfig(sampler=SamplerConfig(method="euler", steps=args.nfe),
                     duration_buckets=(args.bucket,), batch_buckets=(1,),
                     compute_dtype=dtype),
    )
    rng = np.random.default_rng(0)
    ref_frames = 64
    dur = min(args.bucket - 16, 256 + ref_frames)
    cond_mel = (rng.standard_normal((ref_frames, 100)) * 0.5 - 1.0).astype(np.float32)
    row = RowSpec(text="end to end checkpoint test", cond_mel=cond_mel,
                  ref_frames=ref_frames, duration=dur, steps=args.nfe,
                  cfg_strength=2.0, seed=77)
    t0 = time.time()
    wave, mel = engine.synthesize_rows([row])[0]
    print(f"  engine synth: wav {wave.shape} mel {mel.shape} "
          f"({time.time()-t0:.0f}s incl. compile)", flush=True)
    assert np.isfinite(wave).all() and np.abs(wave).max() > 0

    # --- parity: reference CFM loaded from the SAME FILE --------------------
    # the reference's own loader path (utils_infer.py:175-218 semantics)
    t0 = time.time()
    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    msd = {k.replace("ema_model.", ""): v
           for k, v in ckpt["ema_model_state_dict"].items()
           if k not in ("initted", "step")}
    for key in ("mel_spec.mel_stft.mel_scale.fb", "mel_spec.mel_stft.spectrogram.window"):
        msd.pop(key, None)
    cfm.load_state_dict(msd)
    cfm.eval()
    print(f"  reference load_checkpoint path ok ({time.time()-t0:.0f}s)", flush=True)

    # identical solve on both sides: same noise, euler @ nfe, sway -1
    from f5tts_tpu.sampling.euler import sample_cfm

    n = args.bucket
    text_ids = engine.tokenizer.encode([row.text], pad_to=engine.cfg.text_pad)
    cond_pad = np.zeros((1, n, 100), np.float32)
    cond_pad[0, :ref_frames] = cond_mel
    dur_v = np.array([dur], np.int32)

    tl = int(np.sum(text_ids[0] != -1))

    # exact-noise parity: reproduce the reference's per-sample seeded noise
    # (cfm.py:181-186 — manual_seed(seed) then randn(dur, C) per row)
    torch.manual_seed(77)
    y0_ref = torch.randn(dur, 100).numpy()[None].astype(np.float32)
    y0_pad = np.zeros((1, n, 100), np.float32)
    y0_pad[0, :dur] = y0_ref
    ours2 = np.asarray(sample_cfm(
        params, cfg, cond=jnp.asarray(cond_pad), cond_lens=jnp.asarray([ref_frames]),
        text=jnp.asarray(text_ids), duration=jnp.asarray(dur_v),
        sampler=SamplerConfig(method="euler", steps=args.nfe),
        y0=jnp.asarray(y0_pad), compute_dtype=jnp.float32), np.float32)
    t0 = time.time()
    with torch.no_grad():
        want, _ = cfm.sample(
            cond=torch.from_numpy(cond_pad[:, :ref_frames]),
            text=torch.from_numpy(text_ids[:, :tl].astype(np.int64)),
            duration=int(dur), steps=args.nfe, cfg_strength=2.0,
            sway_sampling_coef=-1.0, seed=77,
        )
    want = want.numpy()
    print(f"  torch seeded solve ({time.time()-t0:.0f}s)", flush=True)

    gen = ours2[0, ref_frames:dur]
    want_gen = want[0, ref_frames:dur]
    err = float(np.sqrt(np.mean((gen - want_gen) ** 2)))
    scale = float(np.sqrt(np.mean(want_gen ** 2)))
    rel = err / max(scale, 1e-9)
    print(f"  mel parity vs reference-from-same-file: rmse {err:.5f} "
          f"(rel {rel:.5f})", flush=True)
    ok = rel < 2e-3
    result = {"params_m": n_params / 1e6, "ckpt_gb": size_gb, "nfe": args.nfe,
              "bucket": args.bucket, "platform": args.platform or "default",
              "mel_rmse": err, "mel_rel": rel, "parity_ok": ok,
              "wave_samples": int(wave.shape[0])}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if not args.keep_ckpt:
        os.remove(args.ckpt)
        os.remove(npz)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
