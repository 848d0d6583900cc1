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
    p.add_argument("--nfe", type=int, default=0, help="evals/branch; 0 = method default")
    p.add_argument("--method", default="ralston", help="ODE integrator (shipping default: ralston; euler + --nfe 32 = reference recipe)")
    p.add_argument("--iters", type=int, default=2)
    # 2048 fits the ~21.6s chunks this paragraph produces; measured 23.93
    # audio-s/s vs 12.85 at a mispinned 3072 bucket (34% padding waste +
    # n^2 growth) — bucket choice is a 2x lever, and the engine's default
    # bucket ladder picks 2048 by itself
    p.add_argument("--bucket", type=int, default=2048)
    # cap chunks to a faster bucket (EngineConfig.chunk_frames_budget):
    # --chunk-budget 1024 --bucket 1024 measures the throughput-chunked path
    p.add_argument("--chunk-budget", type=int, default=None)
    # real serving ladder: synthesize_rows splits the request into capped
    # groups (solve_batch_caps; 8 rows at 1024 is the measured per-row
    # optimum) and the dispatch-all-then-fetch overlap engages across groups.
    # Without this flag batch_buckets pins ONE group of --batch rows (the
    # round 1-3 measurement shape).
    p.add_argument("--ladder", action="store_true",
                   help="use the engine's default batch-bucket ladder + solve caps")
    args = p.parse_args(argv)

    from f5tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
    from f5tts_tpu.models.dit import DiTConfig, init_dit
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos
    from f5tts_tpu.sampling.euler import DEFAULT_NFE, SamplerConfig, nfe_to_steps
    from f5tts_tpu.text.tokenizer import Tokenizer

    nfe = args.nfe or DEFAULT_NFE[args.method]
    # flash attention = the serving default on chip (bench.py measures the
    # same); DiTConfig's dataclass default is the portable xla path and
    # costs ~40% at the 1024 bucket
    dit_cfg = DiTConfig(**{**DiTConfig.base().__dict__,
                           "attn_impl": os.environ.get("BENCH_ATTN", "flash")})
    voc_cfg = VocosConfig()
    tok = Tokenizer({" ": 0, **{chr(i): i - 31 for i in range(33, 127)}})
    engine = TTSEngine(
        init_dit(jax.random.PRNGKey(0), dit_cfg), dit_cfg,
        init_vocos(jax.random.PRNGKey(1), voc_cfg), tok,
        EngineConfig(duration_buckets=(args.bucket,),
                     batch_buckets=((1, 2, 4, 8, 16, 32) if args.ladder else (args.batch,)),
                     text_pad=512, compute_dtype="bfloat16",
                     sampler=SamplerConfig(steps=nfe_to_steps(nfe, args.method), method=args.method),
                     chunk_frames_budget=args.chunk_budget),
    )

    # 1.37 s reference tone; the chunker's byte budget then packs sentences
    # into ~25 s chunks (reference speech-rate heuristic)
    sr = 24000
    ref = (np.sin(2 * np.pi * 220 * np.arange(int(1.37 * sr)) / sr) * 0.1).astype(np.float32)
    ref_text = "this is the reference voice."
    # clause-rich prose: the chunker (parity with utils_infer.py:61-88) splits
    # at commas as well as sentence ends, so realistic text packs the byte
    # budget to within one clause (~30-45 bytes); an artificial comma-free
    # sentence understates achievable bucket utilization by ~25%
    sentence = ("The quick brown fox jumps over the lazy dog, then pauses by the river, "
                "watching the dawn light spread, as herons wade through the shallows, "
                "and the village slowly wakes behind the mist. ")
    paragraph = sentence * 400  # plenty of clauses; chunker packs to the budget

    plan = engine.prepare_request(paragraph, ref, sr, ref_text, seed=0, nfe_step=nfe)
    rows = plan.rows[: args.batch]
    # count only frames the pinned bucket actually generates (a row whose
    # predicted duration exceeds the bucket is clamped by the engine)
    gen_frames = sum(min(r.duration, args.bucket) - r.ref_frames for r in rows)
    audio_seconds = gen_frames / (sr / engine.cfg.mel.hop_length)
    print(json.dumps({"rows": len(rows), "frames_per_row": rows[0].duration,
                      "audio_s": round(audio_seconds, 1)}), flush=True)

    # --- chip throughput: the exact compiled program synthesize_rows runs for
    # these rows, timed like bench.py (device-side checksum + scalar fetch).
    # The full engine path below additionally pays host packing + the full
    # mel/wave device->host fetch — through the remote-exec tunnel that
    # transfer is ~100x slower than a real TPU host's PCIe, so the chip
    # number is the production-comparable one (BENCH.md measurement notes).
    import jax.numpy as jnp

    bb = len(rows)
    if args.ladder:
        # honest chip shape for the ladder config: the capped groups
        # synthesize_rows actually solves (8-row programs at 1024 — the
        # measured per-row optimum), chained on the device queue with ONE
        # scalar fetch at the end (bench.py pattern)
        bb = min(dict(engine.cfg.solve_batch_caps).get(args.bucket,
                                                       engine.cfg.batch_buckets[-1]),
                 engine.cfg.batch_buckets[-1])
        if len(rows) < bb:
            # fewer chunks than the solve cap: run one padded group instead of
            # truncating to zero rows (which would divide by zero below)
            bb = len(rows)
        rows = rows[: (len(rows) // bb) * bb]
        gen_frames = sum(min(r.duration, args.bucket) - r.ref_frames for r in rows)
        audio_seconds = gen_frames / (sr / engine.cfg.mel.hop_length)
    fn = engine._compiled(args.bucket, bb, engine.cfg.text_pad, rows[0].steps, rows[0].cfg_strength)
    group_args = []
    for g0 in range(0, len(rows), bb):
        grp = rows[g0 : g0 + bb]
        text_ids = engine.tokenizer.encode([r.text for r in grp], pad_to=engine.cfg.text_pad)
        cond = np.zeros((bb, args.bucket, engine.cfg.mel.n_mels), np.float32)
        cond_lens = np.empty((bb,), np.int32)
        dur = np.empty((bb,), np.int32)
        for i, r in enumerate(grp):
            rf = min(r.ref_frames, args.bucket)
            cond[i, :rf] = r.cond_mel[:rf]
            cond_lens[i] = rf
            dur[i] = min(r.duration, args.bucket)
        seeds = np.arange(bb, dtype=np.int32)
        group_args.append((jnp.asarray(cond), jnp.asarray(cond_lens),
                           jnp.asarray(text_ids), jnp.asarray(dur), jnp.asarray(seeds)))

    def run_once():
        s = None
        for ga in group_args:  # ladder: all groups queue on the device...
            gen, wave = fn(engine.dit_params, engine.vocos_params, *ga)
            s = wave
        return float(jnp.sum(s[:, :64]))  # ...ONE scalar fetch syncs the chain

    run_once()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        checksum = run_once()
    chip_dt = (time.perf_counter() - t0) / args.iters
    assert np.isfinite(checksum)

    # --- full engine path (host packing + full result fetch + stitch)
    engine.synthesize_rows(rows)  # warm path
    t0 = time.perf_counter()
    results = engine.synthesize_rows(rows)
    engine_dt = time.perf_counter() - t0
    wave, out_sr, _ = engine.finalize_request(
        type(plan)(rows=rows, rms=plan.rms, cross_fade_duration=plan.cross_fade_duration), results)
    assert np.isfinite(wave).all()

    print(json.dumps({
        "metric": "longform_audio_s_per_s_per_chip",
        "value": round(audio_seconds / chip_dt, 2),
        "unit": "audio-seconds/second",
        "engine_path_value": round(audio_seconds / engine_dt, 2),
        "config": {"batch": len(rows), "bucket": args.bucket, "nfe": nfe, "method": args.method,
                   "chunk_budget": args.chunk_budget},
    }))


if __name__ == "__main__":
    main()
