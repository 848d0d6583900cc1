"""Parler AR branch: where-the-time-goes + HBM roofline (VERDICT r3 item #5).

The flow branch has a full component/roofline analysis in BENCH.md; this does
the same for the AR decode so "30.4 audio-s/s at batch 16" stops being an
uninspected number. Components timed as separate device programs (tunnel-safe
scalar-checksum fetches, iters-amortized):

  1. T5 encode (once per request)      — flan-t5-large, 24 layers
  2. AR decode (the scan)              — 24-layer delay-pattern decoder,
                                         steps = frames + K - 1
  3. DAC vocode                        — 44.1 kHz descript decoder convnet

and the decode is ablated: greedy vs per-row categorical sampling, half vs
full frame budget (per-step linearity), batch 8/16/32 (weight-read
amortization). The analytic bound: each decode step must stream the decoder's
weights (W bytes) + the KV cache prefix (grows linearly) from HBM; at batch b
the weight read is shared, so

  t_step >= (W + cache(b, j)) / BW_HBM      (v5e: ~819 GB/s)

Reference deployment being analyzed: ``dhwani_config.json:81`` (the
indic-parler-tts entry the reference serves for non-flow voices).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_BW = 819e9  # v5e peak HBM bandwidth, bytes/s


def main(argv=None):
    p = argparse.ArgumentParser("parler-roofline")
    p.add_argument("--frames", type=int, default=430)
    p.add_argument("--batches", default="8,16,32")
    p.add_argument("--depth-knockout", action="store_true",
                   help="also time a half-depth (12-layer) decode at each "
                        "batch: if time halves, the cost is per-layer weight "
                        "streaming; if not, it's fixed per-step overhead")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--out", default="PARLER_ROOFLINE.json")
    args = p.parse_args(argv)

    from f5tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from f5tts_tpu.models import parler as P

    t5_cfg, dec_cfg, dac_cfg = P.T5Config(), P.ParlerDecoderConfig(), P.DacConfig()
    kt, kd, kq = jax.random.split(jax.random.PRNGKey(0), 3)
    t5_p = P.init_t5_encoder(kt, t5_cfg)
    dec_p = P.init_parler_decoder(kd, dec_cfg)
    dac_p = P.init_dac_decoder(kq, dac_cfg)
    dt = jnp.bfloat16

    def nbytes(tree):
        return sum(int(np.prod(x.shape)) * 2 for x in jax.tree.leaves(tree))  # bf16

    W_dec = nbytes(dec_p)
    K = dec_cfg.codebooks
    steps = args.frames + K - 1
    frame_rate = dac_cfg.sampling_rate / dac_cfg.hop

    def timed(fn, *a, iters=args.iters):
        out = fn(*a)
        jax.block_until_ready(out)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # settle
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
            # scalar fetch = tunnel-safe barrier (BENCH.md pattern)
            s = float(jnp.sum((out[0] if isinstance(out, tuple) else out).astype(jnp.float32)))
        dtw = (time.perf_counter() - t0) / iters
        assert np.isfinite(s)
        return dtw

    rng = np.random.default_rng(0)
    desc_pad = 64
    results = {"frames": args.frames, "steps": steps, "dec_param_bytes": W_dec,
               "rows": []}

    for b in [int(x) for x in args.batches.split(",")]:
        ids = jnp.asarray(rng.integers(2, t5_cfg.vocab, (b, desc_pad)), jnp.int32)
        mask = jnp.ones((b, desc_pad), bool)
        prompt = jnp.asarray(rng.integers(2, dec_cfg.prompt_vocab, (b, 64)), jnp.int32)
        pmask = jnp.ones((b, 64), bool)
        seeds = jnp.arange(b, dtype=jnp.int32)

        # params thread through as jit ARGUMENTS — closing a jitted fn over a
        # 1.4 GB param tree serializes it into the remote-compile request and
        # breaks the tunnel (round-3 gotcha, CLAUDE.md)
        t5_fn = jax.jit(lambda p, ids, mask: P.t5_encode(p, t5_cfg, ids, mask, compute_dtype=dt))
        enc = t5_fn(t5_p, ids, mask)
        t_t5 = timed(t5_fn, t5_p, ids, mask)

        def make_decode(temperature, frames):
            def fn(p, enc):
                codes, lengths = P.parler_generate(
                    p, dec_cfg, enc, mask, frames, jax.random.PRNGKey(0),
                    prompt_ids=prompt, prompt_mask=pmask, eos_token=-1,
                    temperature=temperature, top_k=0, max_code=dac_cfg.codebook_size,
                    row_seeds=None if temperature <= 0 else seeds, compute_dtype=dt)
                return codes
            return jax.jit(fn)

        dec_fn = make_decode(1.0, args.frames)
        codes = dec_fn(dec_p, enc)
        t_dec = timed(dec_fn, dec_p, enc)
        t_dec_greedy = timed(make_decode(0.0, args.frames), dec_p, enc)
        t_dec_half = timed(make_decode(1.0, args.frames // 2), dec_p, enc)

        dac_fn = jax.jit(lambda p, codes: P.dac_decode_codes(p, codes, dac_cfg, compute_dtype=dt))
        t_dac = timed(dac_fn, dac_p, codes)

        t_dec_half_depth = None
        if args.depth_knockout:
            import dataclasses

            half_cfg = dataclasses.replace(dec_cfg, layers=dec_cfg.layers // 2)
            half_p = dict(dec_p)
            half_p["blocks"] = jax.tree.map(lambda x: x[: dec_cfg.layers // 2],
                                            dec_p["blocks"])

            def half_fn(p, enc):
                codes, _ = P.parler_generate(
                    p, half_cfg, enc, mask, args.frames, jax.random.PRNGKey(0),
                    prompt_ids=prompt, prompt_mask=pmask, eos_token=-1,
                    temperature=1.0, top_k=0, max_code=dac_cfg.codebook_size,
                    row_seeds=seeds, compute_dtype=dt)
                return codes

            t_dec_half_depth = timed(jax.jit(half_fn), half_p, enc)

        # roofline: avg cache prefix ~ steps/2 (+prompt+1), k+v, all layers
        n_kv = dec_cfg.n_kv
        head_dim = dec_cfg.head_dim
        avg_ctx = 64 + 1 + steps / 2
        cache_bytes = dec_cfg.layers * 2 * b * n_kv * avg_ctx * head_dim * 2
        t_step_bound = (W_dec + cache_bytes) / HBM_BW
        t_step = t_dec / steps
        audio_s = b * args.frames / frame_rate
        total = t_t5 + t_dec + t_dac
        row = {
            "batch": b,
            "t5_ms": t_t5 * 1e3, "decode_ms": t_dec * 1e3, "dac_ms": t_dac * 1e3,
            "decode_greedy_ms": t_dec_greedy * 1e3,
            "decode_half_frames_ms": t_dec_half * 1e3,
            **({"decode_half_depth_ms": t_dec_half_depth * 1e3}
               if t_dec_half_depth is not None else {}),
            "step_us": t_step * 1e6,
            "step_bound_us": t_step_bound * 1e6,
            "bw_efficiency": t_step_bound / t_step,
            "audio_s_per_s_decode_only": audio_s / t_dec,
            "audio_s_per_s_pipeline": audio_s / total,
            "pct_t5": 100 * t_t5 / total, "pct_decode": 100 * t_dec / total,
            "pct_dac": 100 * t_dac / total,
        }
        results["rows"].append(row)
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in row.items()}), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
