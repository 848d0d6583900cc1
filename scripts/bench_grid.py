"""(duration bucket x batch) solve-grid measurement on one chip (VERDICT r2 #3).

Batch scaling of the fused-CFG solve is NOT monotone per bucket (BENCH.md:
1024-bucket throughput HALVES from 8 to 32 rows while 2048 doubles), so every
serving bucket needs a measured row cap. This measures chip throughput
(device-side checksum + scalar fetch — full fetches through the tunnel are
~100x slower than real PCIe) for each requested (bucket, batch) cell at the
shipping sampler and appends one JSON line per cell to the output file, so a
crash/OOM keeps completed cells.

Usage: python scripts/bench_grid.py [--cells "256x8,512x8,..."] [--out SOLVE_GRID.jsonl]
Each compile through the remote tunnel costs minutes — cells run smallest
first; OOM/compile failures are recorded as failed cells, not crashes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CELLS = (
    "256x8,512x8,1024x1,1024x16,1536x8,256x32,512x32,1536x16,2048x16,3072x8,4096x8,3072x16"
)


def main():
    p = argparse.ArgumentParser("bench-grid")
    p.add_argument("--cells", default=DEFAULT_CELLS)
    p.add_argument("--out", default="SOLVE_GRID.jsonl")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--ref-frames", type=int, default=128)
    args = p.parse_args()

    from f5tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
    from f5tts_tpu.models.dit import DiTConfig, init_dit
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos
    from f5tts_tpu.sampling.euler import serving_default_sampler
    from f5tts_tpu.text.tokenizer import Tokenizer

    cells = []
    for c in args.cells.split(","):
        n, b = c.strip().split("x")
        cells.append((int(n), int(b)))
    cells.sort(key=lambda nb: nb[0] * nb[1])

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                r = json.loads(line)
                done.add((r["bucket"], r["batch"]))

    dit_cfg = DiTConfig(**{**DiTConfig.base().__dict__, "attn_impl": "flash"})
    dit_params = init_dit(jax.random.PRNGKey(0), dit_cfg)
    voc_params = init_vocos(jax.random.PRNGKey(1), VocosConfig())
    tok = Tokenizer({" ": 0, **{chr(i): i - 31 for i in range(33, 127)}})
    sampler = serving_default_sampler()
    rng = np.random.default_rng(0)
    rf = args.ref_frames

    for n_frames, batch in cells:
        if (n_frames, batch) in done:
            print(f"skip {n_frames}x{batch} (already measured)", flush=True)
            continue
        rec = {"bucket": n_frames, "batch": batch, "sampler": "ralston@nfe20",
               "ref_frames": rf}
        try:
            cfg = EngineConfig(duration_buckets=(n_frames,), batch_buckets=(batch,),
                               text_pad=512, compute_dtype="bfloat16", sampler=sampler)
            engine = TTSEngine(dit_params, dit_cfg, voc_params, tok, cfg)
            fn = engine._compiled(n_frames, batch, 512, sampler.steps, 2.0)
            cond = jnp.asarray(rng.standard_normal((batch, n_frames, 100)), jnp.float32)
            lens = jnp.full((batch,), rf, jnp.int32)
            text = jnp.asarray(rng.integers(0, 90, (batch, 512)), jnp.int32)
            dur = jnp.full((batch,), n_frames, jnp.int32)
            seeds = jnp.arange(batch, dtype=jnp.int32)

            def run():
                gen, wave = fn(engine.dit_params, engine.vocos_params, cond, lens, text, dur, seeds)
                return float(jnp.sum(wave[:, :64]))  # host fetch = sync barrier

            t0 = time.time()
            checksum = run()
            rec["compile_s"] = round(time.time() - t0, 1)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                checksum = run()
            dt = (time.perf_counter() - t0) / args.iters
            assert np.isfinite(checksum)
            audio_s = batch * (n_frames - rf) / 93.75
            rec.update(solve_s=round(dt, 4), audio_s_per_s=round(audio_s / dt, 2),
                       bucket_frames_per_s=round(batch * n_frames / dt, 1))
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
