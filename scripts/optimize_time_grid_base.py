"""Knot-grid search at BASE geometry on chip (round 3, follow-up).

The tiny-geometry-optimized grids did NOT transfer to base geometry
(QUALITY_BASE_OPTGRID.json: 1.27x/1.11x recipe error vs sway-ralston10's
0.90x) — the knot placement is geometry-sensitive. This searches directly on
the base-geometry toy-trained field with dynamic knots (one compile total;
each candidate is one warm solve), against the SAME cached 512-step truth the
base certification used.

Guard against overfitting the search field: the winner must then be certified
on a HOLDOUT base-geometry field (different toy-train length) via
quality_harness --extra-grid before any default flip.

Usage: python scripts/optimize_time_grid_base.py --intervals 8
Writes TIME_GRID_BASE.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from f5tts_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from f5tts_tpu.eval.quality import mel_l2
from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm, sample_noise_from_seeds
from quality_harness import build_prompts, toy_train


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--intervals", default="8")
    p.add_argument("--fields", default="400",
                   help="comma list of toy-train lengths; each needs its truth/base in "
                        "--solve-cache{'' if 400 else _N} dirs; objective = WORST ratio across fields")
    p.add_argument("--prompts", type=int, default=6)
    p.add_argument("--sweeps", type=int, default=5)
    p.add_argument("--solve-cache", default="/tmp/qbase_cache")
    p.add_argument("--out", default="TIME_GRID_BASE.json")
    args = p.parse_args()

    cfg = DiTConfig.base()
    bucket, cond_frames = 1024, 128
    cond, lens, text, durations, seeds = build_prompts(cfg, args.prompts, bucket, cond_frames)
    gen_mask = (np.arange(bucket)[None, :] >= lens[:, None]) & (np.arange(bucket)[None, :] < durations[:, None])
    y0 = sample_noise_from_seeds(jnp.asarray(seeds), bucket, cfg.mel_dim, jnp.asarray(durations))

    from f5tts_tpu.models.convert import load_params_npz, save_params_npz

    field_steps = [int(v) for v in args.fields.split(",")]
    fields, truths, base_errs = {}, {}, {}
    for fs in field_steps:
        cdir = args.solve_cache if fs == 400 else f"{args.solve_cache}_{fs}"
        truths[fs] = np.load(os.path.join(cdir, "truth.npy"))
        base_errs[fs] = mel_l2(np.load(os.path.join(cdir, "base.npy")), truths[fs], gen_mask)
        print(f"field {fs}: recipe err (cached) {base_errs[fs]:.5f}", flush=True)
        pcache = os.path.join(args.solve_cache, f"field_params_{fs}.npz")
        if os.path.exists(pcache):
            fields[fs] = jax.tree.map(jnp.asarray, load_params_npz(pcache))
            print(f"  params loaded from {pcache}", flush=True)
        else:
            print(f"  toy-training ({fs} steps)...", flush=True)
            fields[fs] = toy_train(init_dit(jax.random.PRNGKey(0), cfg), cfg, fs)
            save_params_npz(pcache, jax.tree.map(np.asarray, fields[fs]))

    kwargs = dict(cond=jnp.asarray(cond), cond_lens=jnp.asarray(lens),
                  text=jnp.asarray(text), duration=jnp.asarray(durations), y0=y0)

    results = {}
    for k in (int(v) for v in args.intervals.split(",")):
        # params as an ARGUMENT, never a closure constant: closed-over
        # arrays serialize into the remote-compile request and a 1.3 GB f32
        # param tree kills the tunnel (broken pipe / HTTP 413)
        solver = jax.jit(lambda p, knots: sample_cfm(
            p, cfg, sampler=SamplerConfig(steps=k, method="ralston"),
            time_grid_array=knots, **kwargs))

        n_evals = [0]

        def ratios(knots) -> dict:
            n_evals[0] += 1
            kj = jnp.asarray(knots, jnp.float32)
            return {fs: mel_l2(np.asarray(solver(fields[fs], kj), np.float32), truths[fs], gen_mask) / base_errs[fs]
                    for fs in fields}

        def ratio(knots) -> float:
            return max(ratios(knots).values())

        t0 = time.time()
        best_g, best_s = None, np.inf
        for coef in (None, -0.5, -0.8, -1.0, -1.2, -1.5):
            for pw in (0.75, 0.9, 1.0, 1.15, 1.4):
                t = np.linspace(0.0, 1.0, k + 1) ** pw
                g = t if coef is None else t + coef * (np.cos(np.pi / 2 * t) - 1 + t)
                s = ratio(g)
                if s < best_s:
                    best_g, best_s = g, s
        print(f"k={k}: family init ratio {best_s:.3f} ({n_evals[0]} evals, {time.time()-t0:.0f}s)", flush=True)

        step = 0.25
        for sweep in range(args.sweeps):
            improved = False
            for i in range(1, k):
                for sign in (+1, -1):
                    g = best_g.copy()
                    lo, hi = g[i - 1], g[i + 1]
                    g[i] = np.clip(g[i] + sign * step * (hi - lo), lo + 0.02 * (hi - lo), hi - 0.02 * (hi - lo))
                    s = ratio(g)
                    if s < best_s - 1e-3:
                        best_g, best_s = g, s
                        improved = True
            print(f"k={k} sweep {sweep}: ratio {best_s:.3f} ({n_evals[0]} evals, {time.time()-t0:.0f}s)", flush=True)
            if not improved:
                step *= 0.5
        results[k] = {"knots": [round(float(v), 6) for v in best_g],
                      "worst_ratio": round(best_s, 4),
                      "per_field_ratio": {str(fs): round(v, 4) for fs, v in ratios(best_g).items()},
                      "nfe_per_branch": 2 * k, "evals": n_evals[0]}
        print(f"k={k}: best {json.dumps(results[k])}", flush=True)

    with open(args.out, "w") as f:
        json.dump({"geometry": "base", "search_fields": field_steps,
                   "note": "search-field ratio only; certify on a holdout field before shipping",
                   "results": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
