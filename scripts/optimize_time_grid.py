"""Search for optimized ODE knot grids for the RK2 serving default.

BENCH.md round-2 headroom #2: the sway warp (``t + s(cos(πt/2)−1+t)``,
``cfm.py:196-198``) was tuned for Euler; a 2nd-order integrator may prefer a
different knot placement. This searches knot grids for ralston@K intervals
against the SAME certification standard the shipping default passed: mel-L2
distance to a 512-step truth solve of the identical guided ODE, normalized by
the Euler-32 recipe's own distance, on toy-trained tiny-geometry fields at
THREE smoothness levels (500/1000/2000 train steps — optimizing on one field
would overfit it). Objective = the WORST ratio across fields.

The sampler takes the knots as a DATA array (``time_grid_array``), so one
compiled program per field evaluates every candidate — the search runs
hundreds of grids in minutes on CPU.

Output: the best grid per K + its per-field ratios, written to
TIME_GRID_SEARCH.json. A found grid ships only after the standard harness
(static ``time_grid``) re-certifies it, including base geometry on chip.

Usage: python scripts/optimize_time_grid.py [--intervals 8,10] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from f5tts_tpu.eval.quality import mel_l2
from f5tts_tpu.models.dit import init_dit
from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm, sample_noise_from_seeds
from quality_harness import TINY, build_prompts, toy_train


def sway_knots(k: int, coef: float = -1.0) -> np.ndarray:
    t = np.linspace(0.0, 1.0, k + 1)
    return t + coef * (np.cos(np.pi / 2 * t) - 1 + t)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--intervals", default="8,10")
    p.add_argument("--fields", default="500,1000,2000")
    p.add_argument("--prompts", type=int, default=6)
    p.add_argument("--sweeps", type=int, default=6)
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--out", default="TIME_GRID_SEARCH.json")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_matmul_precision", "highest")

    cfg = TINY
    bucket, cond_frames = 128, 24
    cond, lens, text, durations, seeds = build_prompts(cfg, args.prompts, bucket, cond_frames)
    gen_mask = (np.arange(bucket)[None, :] >= lens[:, None]) & (np.arange(bucket)[None, :] < durations[:, None])
    y0 = sample_noise_from_seeds(jnp.asarray(seeds), bucket, cfg.mel_dim, jnp.asarray(durations))

    field_steps = [int(v) for v in args.fields.split(",")]
    fields = {}
    for fs in field_steps:
        print(f"toy-training field ({fs} steps)...", flush=True)
        fields[fs] = toy_train(init_dit(jax.random.PRNGKey(0), cfg), cfg, fs)

    base_kwargs = dict(cond=jnp.asarray(cond), cond_lens=jnp.asarray(lens),
                       text=jnp.asarray(text), duration=jnp.asarray(durations), y0=y0)

    truths, base_errs = {}, {}
    for fs, params in fields.items():
        truth = np.asarray(sample_cfm(params, cfg, sampler=SamplerConfig(steps=512), **base_kwargs), np.float32)
        base = np.asarray(sample_cfm(params, cfg, sampler=SamplerConfig(steps=32), **base_kwargs), np.float32)
        truths[fs] = truth
        base_errs[fs] = mel_l2(base, truth, gen_mask)
        print(f"field {fs}: recipe err {base_errs[fs]:.5f}", flush=True)

    results = {}
    for k in (int(v) for v in args.intervals.split(",")):
        solvers = {}
        for fs, params in fields.items():
            # params as an argument (closure constants serialize into the
            # remote-compile request — fatal at base geometry, see the _base
            # variant); harmless but consistent here
            solvers[fs] = jax.jit(lambda p, knots: sample_cfm(
                p, cfg, sampler=SamplerConfig(steps=k, method="ralston"),
                time_grid_array=knots, **base_kwargs))

        def ratios(knots: np.ndarray) -> dict:
            kj = jnp.asarray(knots, jnp.float32)
            return {fs: mel_l2(np.asarray(solvers[fs](fields[fs], kj), np.float32), truths[fs], gen_mask) / base_errs[fs]
                    for fs in fields}

        def worst(knots) -> float:
            return max(ratios(knots).values())

        # ---- init: best of a parametrized family (sway coef x power warp)
        best_g, best_s = None, np.inf
        for coef in (None, -0.5, -0.8, -1.0, -1.2, -1.5):
            for pw in (0.75, 0.9, 1.0, 1.15, 1.4):
                t = np.linspace(0.0, 1.0, k + 1) ** pw
                g = t if coef is None else t + coef * (np.cos(np.pi / 2 * t) - 1 + t)
                s = worst(g)
                if s < best_s:
                    best_g, best_s = g, s
        print(f"k={k}: family init worst-ratio {best_s:.3f}", flush=True)

        # ---- coordinate descent on interior knots
        step = 0.25
        for sweep in range(args.sweeps):
            improved = False
            for i in range(1, k):
                for sign in (+1, -1):
                    g = best_g.copy()
                    lo, hi = g[i - 1], g[i + 1]
                    g[i] = np.clip(g[i] + sign * step * (hi - lo), lo + 0.02 * (hi - lo), hi - 0.02 * (hi - lo))
                    s = worst(g)
                    if s < best_s - 1e-4:
                        best_g, best_s = g, s
                        improved = True
            print(f"k={k} sweep {sweep}: worst-ratio {best_s:.3f}", flush=True)
            if not improved:
                step *= 0.5
        r = ratios(best_g)
        results[k] = {
            "knots": [round(float(v), 6) for v in best_g],
            "worst_ratio": round(best_s, 4),
            "per_field_ratio": {str(fs): round(v, 4) for fs, v in r.items()},
            "sway_baseline_worst": round(worst(sway_knots(k)), 4),
            "nfe_per_branch": 2 * k,
        }
        print(f"k={k}: best {json.dumps(results[k])}", flush=True)

    with open(args.out, "w") as f:
        json.dump({"geometry": "tiny", "standard": "mel-L2 to 512-step truth / recipe's own error, worst field",
                   "fields": field_steps, "results": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
