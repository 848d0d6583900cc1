"""Poisson-load latency/throughput comparison: window vs step-level batcher.

VERDICT round-3 item #1's measurement half: drive both batchers with the same
Poisson arrival trace of serving-shaped requests and record per-request
latency (p50/p95/p99) plus delivered throughput. The window batcher
(``engine/batcher.py``) blocks in one monolithic solve per batch — a request
arriving just after a solve launches waits the whole solve; the step batcher
(``engine/step_batcher.py``) admits rows into running groups every
``segment_intervals`` ODE intervals.

The serving contract being load-tested is the reference's one-blocking-
request-at-a-time route (``/root/reference/src/server/routes/speech.py:30-35``)
— the baseline both batchers replace.

Usage (tiny CPU smoke):
  python scripts/bench_serving_load.py --geometry tiny --platform cpu \
      --rate 4 --requests 40
Chip (base geometry, the real measurement):
  python scripts/bench_serving_load.py --geometry base --dtype bf16 \
      --rate 0.75 --requests 60 --duration-frames 896 --bucket 1024

Tunnel caveat (BENCH.md): each device program call carries ~29 ms RTT here,
which taxes the step batcher (one call per segment) far more than a real
host would; the measured step-batcher numbers are a LOWER bound on its
advantage on production hardware.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from f5tts_tpu.engine.batcher import ContinuousBatcher
from f5tts_tpu.engine.engine import EngineConfig, RowSpec, TTSEngine
from f5tts_tpu.engine.step_batcher import StepBatcher
from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.models.vocos import VocosConfig, init_vocos
from f5tts_tpu.ops.mel import MelConfig
from f5tts_tpu.sampling.euler import serving_default_sampler
from f5tts_tpu.text.tokenizer import Tokenizer

TINY = dict(
    dit=DiTConfig(dim=48, depth=1, heads=2, dim_head=24, mel_dim=16, ff_mult=2,
                  text_num_embeds=120, text_dim=24, conv_layers=1, max_pos=256),
    voc=VocosConfig(input_channels=16, dim=32, intermediate_dim=64, num_layers=1),
    mel=MelConfig(n_mels=16), buckets=(64,), text_pad=32, duration=48, ref=8,
)


def build_engine(args):
    if args.geometry == "tiny":
        t = TINY
        dit_cfg, voc_cfg, mel = t["dit"], t["voc"], t["mel"]
        buckets, text_pad = t["buckets"], t["text_pad"]
    else:
        dit_cfg = DiTConfig.base() if args.geometry == "base" else DiTConfig.small()
        # serving default on chip = flash attention (bench.py parity)
        dit_cfg = type(dit_cfg)(**{**dit_cfg.__dict__,
                                   "attn_impl": os.environ.get("BENCH_ATTN", "flash")})
        voc_cfg = VocosConfig()
        mel = MelConfig()
        buckets = (args.bucket,)
        text_pad = 512
    cfg = EngineConfig(
        mel=mel, vocoder=voc_cfg,
        sampler=serving_default_sampler(),
        duration_buckets=buckets, batch_buckets=(1, 2, 4, 8),
        text_pad=text_pad, compute_dtype="float32" if args.dtype == "f32" else "bfloat16",
    )
    engine = TTSEngine(
        init_dit(jax.random.PRNGKey(0), dit_cfg), dit_cfg,
        init_vocos(jax.random.PRNGKey(1), voc_cfg),
        Tokenizer.from_texts(["serving load test text corpus for the bench"]),
        cfg,
    )
    return engine


def make_trace(args, engine):
    """One fixed arrival trace shared by both batchers: Poisson inter-arrivals
    at --rate req/s, rows sized to --duration-frames (+/- 20%)."""
    rng = np.random.default_rng(args.seed)
    mel_dim = engine.cfg.mel.n_mels
    ref = TINY["ref"] if args.geometry == "tiny" else 128
    base_dur = (TINY["duration"] if args.geometry == "tiny" else args.duration_frames)
    rows, at = [], 0.0
    for i in range(args.requests):
        at += rng.exponential(1.0 / args.rate)
        dur = int(base_dur * rng.uniform(0.8, 1.0))
        cond = (rng.standard_normal((ref, mel_dim)) * 0.5 - 1.0).astype(np.float32)
        rows.append((at, RowSpec(
            text="load test utterance number %d with some words" % i,
            cond_mel=cond, ref_frames=ref, duration=dur,
            steps=engine.cfg.sampler.steps,
            cfg_strength=engine.cfg.sampler.cfg_strength, seed=10_000 + i)))
    return rows


def drive(batcher, trace, frame_s: float):
    """Submit on the trace schedule; wait for all; return metrics."""
    results = [None] * len(trace)
    lats = [0.0] * len(trace)
    lock = threading.Lock()
    done = threading.Event()
    remaining = [len(trace)]

    def on_done(i, t_submit, fut):
        lats[i] = time.perf_counter() - t_submit
        with lock:
            remaining[0] -= 1
            if remaining[0] == 0:
                done.set()

    t0 = time.perf_counter()
    for i, (at, row) in enumerate(trace):
        now = time.perf_counter() - t0
        if now < at:
            time.sleep(at - now)
        t_submit = time.perf_counter()
        fut = batcher.submit(row)
        fut.add_done_callback(
            lambda f, i=i, ts=t_submit: on_done(i, ts, f))
        results[i] = fut
    done.wait(timeout=3600)
    makespan = time.perf_counter() - t0
    errors = sum(1 for f in results if f.exception() is not None)
    gen_frames = sum(
        (row.duration - row.ref_frames) for (_, row) in trace)
    lat = np.array(sorted(lats))
    return {
        "makespan_s": makespan,
        "errors": errors,
        "audio_s": gen_frames * frame_s,
        "audio_s_per_s": gen_frames * frame_s / makespan,
        "p50_ms": float(np.percentile(lat, 50) * 1e3),
        "p95_ms": float(np.percentile(lat, 95) * 1e3),
        "p99_ms": float(np.percentile(lat, 99) * 1e3),
        "mean_ms": float(lat.mean() * 1e3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--geometry", default="tiny", choices=["tiny", "small", "base"])
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--rate", type=float, default=4.0, help="offered load, requests/s")
    p.add_argument("--rates", default=None,
                   help="comma-separated sweep of offered loads (amortizes the "
                        "compile cost across load points); overrides --rate")
    p.add_argument("--requests", type=int, default=40)
    p.add_argument("--duration-frames", type=int, default=896)
    p.add_argument("--bucket", type=int, default=1024)
    p.add_argument("--segment-intervals", type=int, default=2)
    p.add_argument("--batchers", default="window,step,auto")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="LOAD.json")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    engine = build_engine(args)
    mel = engine.cfg.mel
    frame_s = mel.hop_length / mel.sample_rate
    rates = ([float(r) for r in args.rates.split(",")] if args.rates else [args.rate])

    out = {"args": vars(args), "results": {}}
    for name in args.batchers.split(","):
        if name == "window":
            b = ContinuousBatcher(engine, max_batch=8)
        elif name == "auto":
            # the load-adaptive default: step batching + idle-chaining
            b = StepBatcher(engine, segment_intervals=args.segment_intervals,
                            adaptive=True)
        else:
            b = StepBatcher(engine, segment_intervals=args.segment_intervals)
        b.start()
        # warm the shapes the traces will hit (all durations land in one
        # duration bucket; batch widths up to 8)
        args.rate = rates[0]
        warm_row = make_trace(args, engine)[0][1]
        for bb in (1, 2, 4, 8):
            batch = [RowSpec(text=warm_row.text, cond_mel=warm_row.cond_mel,
                             ref_frames=warm_row.ref_frames, duration=warm_row.duration,
                             steps=warm_row.steps, cfg_strength=warm_row.cfg_strength,
                             seed=j) for j in range(bb)]
            futs = [b.submit(r) for r in batch]
            for f in futs:
                f.result(timeout=3600)
        print(f"[{name}] warmed", flush=True)
        for rate in rates:
            args.rate = rate
            trace = make_trace(args, engine)
            base_stats = dict(b.stats)
            m = drive(b, trace, frame_s)
            m["stats"] = {k: (b.stats[k] if k == "max_batch_seen"
                              else b.stats[k] - base_stats.get(k, 0)) for k in b.stats}
            out["results"][f"{name}@{rate}"] = m
            print(f"[{name}@{rate}/s] p50 {m['p50_ms']:.0f}ms p95 {m['p95_ms']:.0f}ms "
                  f"p99 {m['p99_ms']:.0f}ms | {m['audio_s_per_s']:.1f} audio-s/s "
                  f"| errors {m['errors']} | stats {m['stats']}", flush=True)
        b.stop()

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
