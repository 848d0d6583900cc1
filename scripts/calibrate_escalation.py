"""Calibrate the quality=strict escalation threshold
(``EngineConfig.strict_threshold``) on the toy-field ladder.

For each field (toy-train depth -> field sharpness), measure:

- the serving default's TRUE solver error ratio vs the recipe
  (``x recipe-err``, the certification quantity from quality_harness), and
- the embedded per-row error ESTIMATE the default solve produces for free
  (``sample_cfm(return_error_estimate=True)``).

A usable threshold separates the fields where the default certifies
(ratio <= 1) from the sharp fields where no sub-recipe-cost config does
(BENCH.md round-3: tiny 200-step, base 1500-step). Output: per-field table +
the separating threshold range.

Usage:
  python scripts/calibrate_escalation.py --platform cpu          # tiny ladder
  python scripts/calibrate_escalation.py --geometry base \
      --fields 400,800,1500 --truth-steps 512                    # chip ladder
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm, sample_noise_from_seeds

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from quality_harness import TINY, build_prompts, toy_train  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--geometry", default="tiny", choices=["tiny", "base"])
    p.add_argument("--fields", default="200,500,1000,2000",
                   help="comma list of toy-train depths (one field each)")
    p.add_argument("--prompts", type=int, default=6)
    p.add_argument("--truth-steps", type=int, default=512)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--out", default="CALIBRATION.json")
    p.add_argument("--solve-cache", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.geometry == "tiny":
        cfg, bucket, cond_frames = TINY, 128, 24
    else:
        cfg, bucket, cond_frames = DiTConfig.base(), 1024, 128
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    cond, lens, text, durations, seeds = build_prompts(cfg, args.prompts, bucket, cond_frames)
    gen_mask = (np.arange(bucket)[None, :] >= lens[:, None]) & \
               (np.arange(bucket)[None, :] < durations[:, None])
    y0 = sample_noise_from_seeds(jnp.asarray(seeds), bucket, cfg.mel_dim,
                                 jnp.asarray(durations), dtype)

    default = SamplerConfig(method="ralston", steps=10, cfg_strength=2.0, sway_sampling_coef=-1.0)
    recipe = SamplerConfig(method="euler", steps=32, cfg_strength=2.0, sway_sampling_coef=-1.0)

    SEG = int(os.environ.get("QH_SEGMENT_STEPS", 64))

    rows = []
    for depth in [int(v) for v in args.fields.split(",")]:
        print(f"--- field: toy-train {depth} ---", flush=True)
        params = init_dit(jax.random.PRNGKey(0), cfg)
        params = toy_train(params, cfg, depth)

        def solve(sampler, estimate=False, tag=""):
            if args.solve_cache:
                os.makedirs(args.solve_cache, exist_ok=True)
                cpath = os.path.join(args.solve_cache, f"f{depth}_{tag}.npz")
                if os.path.exists(cpath):
                    z = np.load(cpath)
                    return ((z["mel"], z["est"]) if estimate else z["mel"])
            t0 = time.time()
            kw = dict(cond=jnp.asarray(cond), cond_lens=jnp.asarray(lens),
                      text=jnp.asarray(text), duration=jnp.asarray(durations),
                      compute_dtype=dtype)
            if sampler.steps <= SEG:
                out = sample_cfm(params, cfg, sampler=sampler, y0=y0,
                                 return_error_estimate=estimate, **kw)
            else:
                out = y0
                for a in range(0, sampler.steps, SEG):
                    b = min(a + SEG, sampler.steps)
                    out = sample_cfm(params, cfg, sampler=sampler, y0=jnp.asarray(out),
                                     knot_range=(a, b), paste_back=(b == sampler.steps), **kw)
                    out = np.asarray(out)
            if estimate:
                mel, est = np.asarray(out[0], np.float32), np.asarray(out[1], np.float32)
            else:
                mel, est = np.asarray(out, np.float32), None
            print(f"  solved {tag or sampler.method}{sampler.steps} in {time.time()-t0:.0f}s", flush=True)
            if args.solve_cache:
                np.savez(cpath, mel=mel, est=est if est is not None else np.zeros(1))
            return (mel, est) if estimate else mel

        truth = solve(SamplerConfig(method="euler", steps=args.truth_steps,
                                    cfg_strength=2.0, sway_sampling_coef=-1.0), tag="truth")
        recipe_mel = solve(recipe, tag="recipe")
        default_mel, est = solve(default, estimate=True, tag="default")

        def err(x):
            d = (np.asarray(x, np.float64) - truth.astype(np.float64)) ** 2 * gen_mask[..., None]
            per_row = np.sqrt(d.sum(axis=(1, 2)) / (gen_mask.sum(axis=1) * cfg.mel_dim))
            return per_row

        err_recipe = err(recipe_mel)
        err_default = err(default_mel)
        row = {
            "field": depth,
            "recipe_err": float(np.sqrt(np.mean(err_recipe**2))),
            "default_err": float(np.sqrt(np.mean(err_default**2))),
            "ratio": float(np.sqrt(np.mean(err_default**2)) / np.sqrt(np.mean(err_recipe**2))),
            "est_mean": float(est.mean()),
            "est_max": float(est.max()),
            "est_per_row": est.tolist(),
            "ratio_per_row": (err_default / np.maximum(err_recipe, 1e-12)).tolist(),
        }
        rows.append(row)
        print(json.dumps(row, indent=1), flush=True)

    print("\n| field | x recipe-err | est mean | est max | certified |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['field']} | {r['ratio']:.2f} | {r['est_mean']:.4f} "
              f"| {r['est_max']:.4f} | {'YES' if r['ratio'] <= 1.0 else 'no'} |")
    ok = [r for r in rows if r["ratio"] <= 1.0]
    bad = [r for r in rows if r["ratio"] > 1.0]
    if ok and bad:
        lo = max(r["est_max"] for r in ok)
        hi = min(r["est_mean"] for r in bad)
        print(f"\nseparating threshold range: ({lo:.4f}, {hi:.4f}) "
              f"{'— SEPARABLE' if lo < hi else '— NOT separable at per-field granularity'}")
    with open(args.out, "w") as f:
        json.dump({"geometry": args.geometry, "rows": rows}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
