"""BASELINE config #4: long-form paragraph -> chunked, batched, crossfaded.

Runs the REAL product path (``TTSEngine.prepare_request`` -> chunker ->
``synthesize_rows`` -> crossfade stitch) on a paragraph long enough to fill
``--batch`` chunk rows. The reference's speech-rate byte budget targets ~25 s
of audio per chunk (``utils_infer.py:377``), so long-form rows land in the
3072-frame bucket — this measures that honest geometry, not the short-text
1024 bucket the headline bench uses.

Usage: python scripts/bench_longform.py [--batch 32] [--nfe 32] [--iters 2]
Prints one JSON line: {"metric": "longform_audio_s_per_s_per_chip", ...}
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
    p = argparse.ArgumentParser("bench-longform")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--nfe", type=int, default=32)
    p.add_argument("--iters", type=int, default=2)
    # 2048 fits the ~21.6s chunks this paragraph produces; measured 23.93
    # audio-s/s vs 12.85 at a mispinned 3072 bucket (34% padding waste +
    # n^2 growth) — bucket choice is a 2x lever, and the engine's default
    # bucket ladder picks 2048 by itself
    p.add_argument("--bucket", type=int, default=2048)
    # cap chunks to a faster bucket (EngineConfig.chunk_frames_budget):
    # --chunk-budget 1024 --bucket 1024 measures the throughput-chunked path
    p.add_argument("--chunk-budget", type=int, default=None)
    args = p.parse_args(argv)

    from f5tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
    from f5tts_tpu.models.dit import DiTConfig, init_dit
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos
    from f5tts_tpu.sampling.euler import SamplerConfig
    from f5tts_tpu.text.tokenizer import Tokenizer

    dit_cfg = DiTConfig.base()
    voc_cfg = VocosConfig()
    tok = Tokenizer({" ": 0, **{chr(i): i - 31 for i in range(33, 127)}})
    engine = TTSEngine(
        init_dit(jax.random.PRNGKey(0), dit_cfg), dit_cfg,
        init_vocos(jax.random.PRNGKey(1), voc_cfg), tok,
        EngineConfig(duration_buckets=(args.bucket,), batch_buckets=(args.batch,),
                     text_pad=512, compute_dtype="bfloat16",
                     sampler=SamplerConfig(steps=args.nfe),
                     chunk_frames_budget=args.chunk_budget),
    )

    # 1.37 s reference tone; the chunker's byte budget then packs sentences
    # into ~25 s chunks (reference speech-rate heuristic)
    sr = 24000
    ref = (np.sin(2 * np.pi * 220 * np.arange(int(1.37 * sr)) / sr) * 0.1).astype(np.float32)
    ref_text = "this is the reference voice."
    sentence = "The quick brown fox jumps over the lazy dog near the riverbank at dawn. "
    paragraph = sentence * 400  # plenty of sentences; chunker packs ~25 s chunks

    plan = engine.prepare_request(paragraph, ref, sr, ref_text, seed=0, nfe_step=args.nfe)
    rows = plan.rows[: args.batch]
    gen_frames = sum(r.duration - r.ref_frames for r in rows)
    audio_seconds = gen_frames / (sr / engine.cfg.mel.hop_length)
    print(json.dumps({"rows": len(rows), "frames_per_row": rows[0].duration,
                      "audio_s": round(audio_seconds, 1)}), flush=True)

    engine.synthesize_rows(rows)  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        results = engine.synthesize_rows(rows)
    dt = (time.perf_counter() - t0) / args.iters
    # include the host-side stitch in one timed pass (it is part of the path)
    wave, out_sr, _ = engine.finalize_request(
        type(plan)(rows=rows, rms=plan.rms, cross_fade_duration=plan.cross_fade_duration), results)
    assert np.isfinite(wave).all()

    print(json.dumps({
        "metric": "longform_audio_s_per_s_per_chip",
        "value": round(audio_seconds / dt, 2),
        "unit": "audio-seconds/second",
        "config": {"batch": len(rows), "bucket": args.bucket, "nfe": args.nfe},
    }))


if __name__ == "__main__":
    main()
