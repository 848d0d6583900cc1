"""BASELINE config #3: ParlerTTS-architecture AR branch at batch 16.

Random-init weights at the REAL indic-parler-tts geometry (flan-t5-large
encoder, 24-layer/1024-hidden delay-pattern decoder with 9 codebooks, 44.1 kHz
descript DAC) through the batched serving engine
(``engine/ar_engine.py:ParlerTTSEngine``): T5-encode 16 style descriptions,
KV-cache scan decode, DAC vocode, per-row length trim.

Throughput accounting: DAC frame rate = 44100 / 512 ≈ 86.13 frames/s; with
greedy decoding and eos disabled every row runs the full frame budget, so
audio-s = batch * frames / 86.13 (an upper bound on per-request work — real
requests stop at EOS earlier).

Usage: python scripts/bench_parler.py [--batch 16] [--frames 430] [--iters 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("bench-parler")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=430, help="~5 s at the DAC rate")
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--decode-layout", default=None, choices=[None, "stacked", "unrolled"])
    p.add_argument("--fuse-qkv", type=int, default=-1, help="-1 keep, 0 off, 1 on")
    p.add_argument("--decode-attn", default=None, choices=[None, "xla", "pallas"])
    args = p.parse_args(argv)

    from f5tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from f5tts_tpu.engine.ar_engine import ParlerEngineConfig, ParlerTTSEngine
    from f5tts_tpu.models import parler as P

    t5, dec, dac = P.T5Config(), P.ParlerDecoderConfig(), P.DacConfig()
    kt, kd, kq = jax.random.split(jax.random.PRNGKey(0), 3)
    eng = ParlerTTSEngine(
        P.init_t5_encoder(kt, t5), t5,
        P.init_parler_decoder(kd, dec), dec,
        P.init_dac_decoder(kq, dac), dac,
        ParlerEngineConfig(max_frames=args.frames, desc_pad=64, prompt_pad=64,
                           temperature=0.0,  # greedy; random-init rows never EOS early
                           eos_token=-1, compute_dtype="bfloat16",
                           decode_layout=args.decode_layout,
                           fuse_decode_qkv=None if args.fuse_qkv < 0 else bool(args.fuse_qkv),
                           decode_attn=args.decode_attn),
        encode_fn=lambda s: [ord(c) % t5.vocab for c in s],
    )

    descs = [f"A calm female speaker with clear diction, take {i}." for i in range(args.batch)]
    prompts = [f"This is utterance number {i} for the throughput benchmark." for i in range(args.batch)]

    waves = eng.synthesize_batch(descs, prompts)  # warmup/compile (miss path)
    waves = eng.synthesize_batch(descs, prompts)  # desc-cache warm path compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        waves = eng.synthesize_batch(descs, prompts)
    dt = (time.perf_counter() - t0) / args.iters
    assert all(np.isfinite(w).all() for w in waves)

    frame_rate = dac.sampling_rate / dac.hop
    audio_seconds = args.batch * args.frames / frame_rate
    print(json.dumps({
        "metric": "parler_ar_audio_s_per_s_per_chip",
        "value": round(audio_seconds / dt, 2),
        "unit": "audio-seconds/second",
        "config": {"batch": args.batch, "frames": args.frames,
                   "decode_steps_per_s": round(args.batch * (args.frames + dec.codebooks - 1) / dt, 1)},
    }))


if __name__ == "__main__":
    main()
