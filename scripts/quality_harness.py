"""Certify reduced-compute sampler configurations against the reference recipe.

The reference serves NFE 32 / CFG 2.0 / sway −1.0, guidance on every step
(``/root/reference/src/server/f5_tts/infer/utils_infer.py:49-52``). Two
measurements per knob, on a fixed prompt set with identical weights and noise:

1. **Error-to-truth (the certification).** Every config — including the
   recipe itself — solves the SAME guided ODE (same weights, noise, guidance
   scale on every step); they differ only in how accurately they integrate
   it. "Truth" is a 512-step Euler solve on the same sway grid. A config is
   CERTIFIED when its distance to truth is at or below the reference
   recipe's own distance to truth — i.e. it delivers at-least-recipe solver
   accuracy. This is how a 2nd-order integrator (midpoint, 2 evals/step) at
   16 total evals can certify: its O(h²) error beats Euler-32's O(h) error
   at half the forwards.
2. **Drift from the recipe output** (secondary, the round-1 table): how far
   the knob's output is from the NFE-32 recipe's exact output, anchored
   against the recipe's own NFE32→NFE64 discretization distance.

Weights: ``--ckpt`` (torch/.npz/orbax) when available; otherwise random init
at ``--geometry`` (the flow field is untrained but fixed and Lipschitz — knob
deviations are still comparable against the discretization anchor), optionally
``--toy-train N`` steps at tiny geometry on structured synthetic data so the
field is a genuinely trained (smooth) one.

Outputs a markdown table + QUALITY.json. Run on TPU for base geometry
(each distinct config compiles its own program through the remote tunnel);
tiny geometry runs anywhere.

Usage:
  python scripts/quality_harness.py --geometry tiny --toy-train 300
  python scripts/quality_harness.py --geometry base --dtype bf16 \
      --configs base,anchor64,cache4,nfe16
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

from f5tts_tpu.eval.quality import quality_report
from f5tts_tpu.models.dit import DiTConfig, dit_forward, init_dit
from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm, sample_noise_from_seeds

TINY = DiTConfig(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
                 text_num_embeds=32, text_dim=32, conv_layers=2)

CONFIGS: dict[str, SamplerConfig] = {
    "base": SamplerConfig(steps=32, cfg_strength=2.0, sway_sampling_coef=-1.0),
    "anchor64": SamplerConfig(steps=64, cfg_strength=2.0, sway_sampling_coef=-1.0),
    "truth": SamplerConfig(steps=512, cfg_strength=2.0, sway_sampling_coef=-1.0),
    # midpoint (RK2): 2 velocity evals per interval — midN costs 2N evals,
    # so mid8 == the compute of Euler NFE 16 with 2nd-order accuracy
    "mid6": SamplerConfig(steps=6, cfg_strength=2.0, sway_sampling_coef=-1.0, method="midpoint"),
    "mid8": SamplerConfig(steps=8, cfg_strength=2.0, sway_sampling_coef=-1.0, method="midpoint"),
    "mid10": SamplerConfig(steps=10, cfg_strength=2.0, sway_sampling_coef=-1.0, method="midpoint"),
    "mid16": SamplerConfig(steps=16, cfg_strength=2.0, sway_sampling_coef=-1.0, method="midpoint"),
    **{f"heun{n}": SamplerConfig(steps=n, cfg_strength=2.0, sway_sampling_coef=-1.0, method="heun")
       for n in (8, 10, 16)},
    **{f"ralston{n}": SamplerConfig(steps=n, cfg_strength=2.0, sway_sampling_coef=-1.0, method="ralston")
       for n in (8, 10, 16)},
    **{f"rk4_{n}": SamplerConfig(steps=n, cfg_strength=2.0, sway_sampling_coef=-1.0, method="rk4")
       for n in (4, 5, 8)},
    # r = within-step null reuse (pair on the first eval, cond-only after):
    # RK2 intervals cost 3 forwards instead of 4, rk4 intervals 5 instead of 8
    **{f"mid{n}r": SamplerConfig(steps=n, cfg_strength=2.0, sway_sampling_coef=-1.0,
                                 method="midpoint", cfg_null_reuse=True)
       for n in (10, 12, 14)},
    **{f"heun{n}r": SamplerConfig(steps=n, cfg_strength=2.0, sway_sampling_coef=-1.0,
                                  method="heun", cfg_null_reuse=True)
       for n in (10, 12, 14)},
    **{f"rk4_{n}r": SamplerConfig(steps=n, cfg_strength=2.0, sway_sampling_coef=-1.0,
                                  method="rk4", cfg_null_reuse=True)
       for n in (5, 6, 8)},
    # sway-coefficient variants for the RK2 grid (the sway warp was tuned for
    # Euler; second-order methods may prefer a flatter grid)
    **{f"mid10_s{tag}": SamplerConfig(steps=10, cfg_strength=2.0, sway_sampling_coef=c, method="midpoint")
       for tag, c in (("0", None), ("05", -0.5), ("15", -1.5))},
    **{f"heun10_s{tag}": SamplerConfig(steps=10, cfg_strength=2.0, sway_sampling_coef=c, method="heun")
       for tag, c in (("0", None), ("05", -0.5))},
    "cache2": SamplerConfig(steps=32, cfg_strength=2.0, sway_sampling_coef=-1.0, cfg_cache_period=2),
    "cache4": SamplerConfig(steps=32, cfg_strength=2.0, sway_sampling_coef=-1.0, cfg_cache_period=4),
    "interval05": SamplerConfig(steps=32, cfg_strength=2.0, sway_sampling_coef=-1.0, cfg_interval=(0.0, 0.5)),
    "nfe16": SamplerConfig(steps=16, cfg_strength=2.0, sway_sampling_coef=-1.0),
    "nfe16_cache2": SamplerConfig(steps=16, cfg_strength=2.0, sway_sampling_coef=-1.0, cfg_cache_period=2),
    "cache2x": SamplerConfig(steps=32, cfg_strength=2.0, sway_sampling_coef=-1.0,
                             cfg_cache_period=2, cfg_cache_mode="extrapolate"),
    "cache4x": SamplerConfig(steps=32, cfg_strength=2.0, sway_sampling_coef=-1.0,
                             cfg_cache_period=4, cfg_cache_mode="extrapolate"),
    "nfe16_cache2x": SamplerConfig(steps=16, cfg_strength=2.0, sway_sampling_coef=-1.0,
                                   cfg_cache_period=2, cfg_cache_mode="extrapolate"),
}


def structured_toy_batch(rng, cfg: DiTConfig, batch: int, n: int, frames_per_token: int = 8):
    """Synthetic text→mel data with a learnable mapping: each token id paints a
    fixed spectral pattern over its frame span (plus small noise), so a few
    hundred CFM steps produce a genuinely smooth trained flow field."""
    patterns = np.random.default_rng(0).standard_normal((cfg.text_num_embeds, cfg.mel_dim)) * 0.8 - 1.0
    nt = n // frames_per_token
    text = rng.integers(0, cfg.text_num_embeds, (batch, nt)).astype(np.int32)
    mel = patterns[text]  # (b, nt, mel)
    mel = np.repeat(mel, frames_per_token, axis=1)[:, :n]
    mel = mel + rng.standard_normal(mel.shape) * 0.05
    lens = rng.integers(n // 2, n + 1, (batch,)).astype(np.int32)
    return mel.astype(np.float32), text, lens


def toy_train(params, cfg: DiTConfig, steps: int, batch: int = 8, n: int = 128):
    import optax

    from f5tts_tpu.models.cfm import CFMConfig, cfm_loss

    ccfg = CFMConfig(model=cfg)
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)
    rng = np.random.default_rng(1)

    @jax.jit
    def step(params, opt_state, key, mel, text, lens):
        (loss, _), grads = jax.value_and_grad(cfm_loss, has_aux=True)(params, ccfg, key, mel, text, lens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(0)
    for i in range(steps):
        mel, text, lens = structured_toy_batch(rng, cfg, batch, n)
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub,
                                       jnp.asarray(mel), jnp.asarray(text), jnp.asarray(lens))
        if i % 50 == 0 or i == steps - 1:
            print(f"  toy-train step {i}: loss {float(loss):.4f}", flush=True)
    return params


_EVALS = {"euler": 1, "midpoint": 2, "heun": 2, "ralston": 2, "rk4": 4}


def n_forwards(s: SamplerConfig) -> int:
    """Batch-b DiT forward count per solve (fused 2b pair = 2 forwards)."""
    evals_per_step = _EVALS[s.method]
    if s.cfg_null_reuse and s.cfg_strength >= 1e-5:
        return s.steps * (2 + (evals_per_step - 1))
    steps = s.steps * evals_per_step
    if s.cfg_strength < 1e-5:
        return steps
    if s.cfg_cache_period > 1:
        k = s.cfg_cache_period
        groups = s.steps // k
        return steps + groups + (s.steps - groups * k)  # cond every step + null refreshes
    lo, hi = s.cfg_interval
    if (lo, hi) != (0.0, 1.0):
        t = np.linspace(0.0, 1.0, s.steps + 1)
        if s.sway_sampling_coef is not None:
            t = t + s.sway_sampling_coef * (np.cos(np.pi / 2 * t) - 1 + t)
        guided = int(np.sum((t[:-1] >= lo) & (t[:-1] < hi)))
        return evals_per_step * (2 * guided + (s.steps - guided))
    return 2 * steps


def build_prompts(cfg: DiTConfig, k: int, bucket: int, cond_frames: int, seed: int = 7):
    """Fixed prompt set: synthetic reference mels (smooth harmonics, not white
    noise), text ids, spread of durations filling [60%, 100%] of the bucket."""
    rng = np.random.default_rng(seed)
    t = np.arange(cond_frames)[:, None] / 93.75
    freqs = rng.uniform(0.5, 4.0, (k, 1, cfg.mel_dim))
    phase = rng.uniform(0, 2 * np.pi, (k, 1, cfg.mel_dim))
    cond_valid = np.sin(2 * np.pi * freqs * t[None] + phase) * 0.7 - 1.5
    cond = np.zeros((k, bucket, cfg.mel_dim), np.float32)
    cond[:, :cond_frames] = cond_valid
    durations = np.linspace(0.6 * bucket, bucket, k).astype(np.int32)
    nt = int(0.12 * bucket)
    text = rng.integers(0, cfg.text_num_embeds, (k, nt)).astype(np.int32)
    for r in range(k):  # vary text lengths
        cut = int(nt * (0.5 + 0.5 * r / max(k - 1, 1)))
        text[r, cut:] = -1
    seeds = np.arange(1000, 1000 + k, dtype=np.int32)
    lens = np.full((k,), cond_frames, np.int32)
    return cond, lens, text, durations, seeds


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--geometry", default="tiny", choices=["tiny", "small", "base"])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--toy-train", type=int, default=0)
    p.add_argument("--prompts", type=int, default=6)
    p.add_argument("--bucket", type=int, default=None)
    p.add_argument("--cond-frames", type=int, default=None)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--attn", default=None, choices=[None, "xla", "flash"])
    p.add_argument("--configs", default=",".join(CONFIGS))
    p.add_argument("--extra-grid", action="append", default=[],
                   help="name:method:k0;k1;...;kN — add a custom-knot config "
                        "(e.g. the optimize_time_grid.py winner) to the certification set")
    p.add_argument("--out", default="QUALITY.json")
    p.add_argument("--solve-cache", default=None,
                   help="directory to persist per-config solved mels (npz); a crashed "
                        "run (TPU worker restarts happen) resumes instead of resolving. "
                        "Weights must be deterministic for the cache to be valid "
                        "(fixed seeds / same --toy-train).")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                   help="force a jax platform (env vars are pre-empted by sitecustomize)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    for spec in args.extra_grid:
        name, method, knots = spec.split(":")
        grid = tuple(float(v) for v in knots.split(";"))
        CONFIGS[name] = SamplerConfig(steps=len(grid) - 1, cfg_strength=2.0, method=method,
                                      time_grid=grid)

    if args.geometry == "tiny":
        cfg = TINY
        bucket = args.bucket or 128
        cond_frames = args.cond_frames or 24
    else:
        cfg = DiTConfig.base() if args.geometry == "base" else DiTConfig.small()
        bucket = args.bucket or 1024
        cond_frames = args.cond_frames or 128
    if args.attn:
        from dataclasses import replace

        cfg = replace(cfg, attn_impl=args.attn)

    if args.ckpt:
        from f5tts_tpu.models.convert import load_f5_checkpoint

        params = load_f5_checkpoint(args.ckpt, cfg)
        weights = f"ckpt:{args.ckpt}"
    else:
        params = init_dit(jax.random.PRNGKey(0), cfg)
        weights = "random-init"
        if args.toy_train:
            print(f"toy-training {args.toy_train} steps at {args.geometry} geometry...")
            params = toy_train(params, cfg, args.toy_train)
            weights = f"toy-trained:{args.toy_train}"

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cond, lens, text, durations, seeds = build_prompts(cfg, args.prompts, bucket, cond_frames)
    gen_mask = (np.arange(bucket)[None, :] >= lens[:, None]) & (np.arange(bucket)[None, :] < durations[:, None])

    y0 = sample_noise_from_seeds(jnp.asarray(seeds), bucket, cfg.mel_dim, jnp.asarray(durations), dtype)

    # single device executions beyond a few minutes can crash the remote TPU
    # worker (observed twice on the 512-step base-geometry truth solve):
    # segment long solves into <= SEG-step programs with host fetches between
    SEG = int(os.environ.get("QH_SEGMENT_STEPS", 64))

    def solve(sampler: SamplerConfig):
        t0 = time.time()
        if sampler.steps <= SEG:
            out = sample_cfm(
                params, cfg, cond=jnp.asarray(cond), cond_lens=jnp.asarray(lens),
                text=jnp.asarray(text), duration=jnp.asarray(durations),
                sampler=sampler, y0=y0, compute_dtype=dtype,
            )
        else:
            out = y0
            for a in range(0, sampler.steps, SEG):
                b = min(a + SEG, sampler.steps)
                out = sample_cfm(
                    params, cfg, cond=jnp.asarray(cond), cond_lens=jnp.asarray(lens),
                    text=jnp.asarray(text), duration=jnp.asarray(durations),
                    sampler=sampler, y0=jnp.asarray(out), compute_dtype=dtype,
                    knot_range=(a, b), paste_back=(b == sampler.steps),
                )
                out = np.asarray(out)  # host fetch ends the device program
                print(f"  segment knots {a}..{b} done ({time.time() - t0:.0f}s)", flush=True)
        out = np.asarray(out, np.float32)  # forces host fetch (tunnel-safe timing)
        return out, time.time() - t0

    names = [n.strip() for n in args.configs.split(",") if n.strip()]
    if "base" not in names:
        names.insert(0, "base")
    outputs = {}
    for name in names:
        if args.solve_cache:
            os.makedirs(args.solve_cache, exist_ok=True)
            cpath = os.path.join(args.solve_cache, f"{name}.npy")
            if os.path.exists(cpath):
                outputs[name] = np.load(cpath)
                print(f"loaded {name:>14} from solve cache", flush=True)
                continue
        outputs[name], dt = solve(CONFIGS[name])
        if args.solve_cache:
            np.save(cpath, outputs[name])
        print(f"solved {name:>14} in {dt:.1f}s (incl. compile)", flush=True)

    base = outputs["base"]
    anchor = outputs.get("anchor64")
    anchor_l2 = quality_report(anchor, base, gen_mask)["mel_l2"] if anchor is not None else None
    truth = outputs.get("truth")
    base_truth_l2 = quality_report(base, truth, gen_mask)["mel_l2"] if truth is not None else None

    header = f"quality harness — {args.geometry} / {weights} / {args.dtype} / bucket {bucket} / {args.prompts} prompts"
    print("\n" + header)

    rows = []
    for name in names:
        if name == "base":
            rep = {"name": name, "forwards": n_forwards(CONFIGS[name])}
            if base_truth_l2 is not None:
                rep.update(quality_report(base, truth, gen_mask))
                rep["vs_recipe_truth_err"] = 1.0
                rep["certified"] = None
            rows.append(rep)
            continue
        rep = {"name": name, "forwards": n_forwards(CONFIGS[name])}
        drift = quality_report(outputs[name], base, gen_mask)
        rep["drift_mel_l2"] = drift["mel_l2"]
        rep["drift_mcd_db"] = drift["mcd_db"]
        if anchor_l2:
            rep["vs_discretization"] = drift["mel_l2"] / anchor_l2
        if truth is not None and name != "truth":
            rep.update(quality_report(outputs[name], truth, gen_mask))
            rep["vs_recipe_truth_err"] = rep["mel_l2"] / max(base_truth_l2, 1e-12)
            rep["certified"] = bool(rep["mel_l2"] <= base_truth_l2 * (1.0 + 1e-9))
        rows.append(rep)

    if truth is not None:
        print("\nError-to-truth (512-step solve of the same guided ODE); certified = "
              "at-or-below the reference recipe's own solver error:")
        print("| config | forwards | mel L2 → truth | MCD (dB) → truth | ×recipe-err | certified |")
        print("|---|---|---|---|---|---|")
        for r in sorted([r for r in rows if "vs_recipe_truth_err" in r], key=lambda r: r["forwards"]):
            cert = {True: "YES", False: "no", None: "(recipe)"}.get(r.get("certified"), "—")
            print(f"| {r['name']} | {r['forwards']} | {r['mel_l2']:.4f} | {r['mcd_db']:.3f} "
                  f"| {r['vs_recipe_truth_err']:.2f} | {cert} |")

    print("\nDrift from the recipe's exact output (secondary):")
    print("| config | forwards | mel L2 | MCD (dB) | ×discretization |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "drift_mel_l2" not in r:
            continue
        ratio = f"{r.get('vs_discretization', float('nan')):.2f}" if anchor_l2 else "—"
        print(f"| {r['name']} | {r['forwards']} | {r['drift_mel_l2']:.4f} | {r['drift_mcd_db']:.3f} | {ratio} |")

    result = {"header": header, "weights": weights, "geometry": args.geometry,
              "anchor_mel_l2": anchor_l2, "base_truth_l2": base_truth_l2, "rows": rows}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
