"""Distill a few-step student from a toy-trained field and certify it.

Pipeline per field: toy-train a teacher at the given geometry -> solve the
512-step truth + the Euler-32 recipe on the certification prompts -> distill
a K-step student (``f5tts_tpu/train/distill.py``) on RANDOM prompts drawn
from the same distribution family (never the certification prompts) ->
measure the student's error-to-truth vs the recipe's.

Certified = student mel-L2 to truth <= the recipe's own mel-L2 to truth,
i.e. the student's K-forward rollout (no CFG pair: guidance is baked in)
delivers at-least-recipe accuracy of the same guided solution.

Usage:
  python scripts/distill_certify.py --geometry tiny --toy-train 1000 \
      --student-steps 8 --distill-steps 300
  python scripts/distill_certify.py --geometry base --toy-train 1500 \
      --platform tpu --dtype bf16 --solve-cache /tmp/dc1500
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

from quality_harness import CONFIGS, TINY, build_prompts, toy_train

from f5tts_tpu.eval.quality import quality_report
from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.sampling.euler import sample_cfm, sample_noise_from_seeds
from f5tts_tpu.train.distill import DistillConfig, distill, student_sampler


def make_prompt_fn(cfg: DiTConfig, batch: int, bucket: int, cond_frames: int):
    """Random serving-shaped prompts, same family as the certification set
    (harmonic cond mels, random text, durations 60-100% of bucket) but drawn
    fresh per training step — the certification prompts (seed 7, seeds
    1000..1005) are held out by construction."""

    def prompt_fn(rng: np.random.Generator):
        t = np.arange(cond_frames)[:, None] / 93.75
        freqs = rng.uniform(0.5, 4.0, (batch, 1, cfg.mel_dim))
        phase = rng.uniform(0, 2 * np.pi, (batch, 1, cfg.mel_dim))
        cond = np.zeros((batch, bucket, cfg.mel_dim), np.float32)
        cond[:, :cond_frames] = np.sin(2 * np.pi * freqs * t[None] + phase) * 0.7 - 1.5
        durations = rng.integers(int(0.6 * bucket), bucket + 1, (batch,)).astype(np.int32)
        nt = int(0.12 * bucket)
        text = rng.integers(0, cfg.text_num_embeds, (batch, nt)).astype(np.int32)
        for r in range(batch):
            cut = rng.integers(nt // 2, nt + 1)
            text[r, cut:] = -1
        return {
            "cond": cond,
            "cond_lens": np.full((batch,), cond_frames, np.int32),
            "text": text,
            "duration": durations,
            "seeds": rng.integers(1 << 20, 1 << 30, (batch,)).astype(np.int32),
        }

    return prompt_fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--geometry", default="tiny", choices=["tiny", "small", "base"])
    p.add_argument("--toy-train", type=int, default=500)
    p.add_argument("--student-steps", type=int, default=8)
    p.add_argument("--substeps", type=int, default=8)
    p.add_argument("--distill-steps", type=int, default=300)
    p.add_argument("--distill-batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--prompts", type=int, default=6)
    p.add_argument("--bucket", type=int, default=None)
    p.add_argument("--cond-frames", type=int, default=None)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--distill-dtype", default=None, choices=[None, "f32", "bf16"],
                   help="compute dtype for the distillation steps only (certification "
                        "solves keep --dtype); bf16 distill is ~3x faster on chip")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--sway", type=float, default=-1.0,
                   help="student knot-grid sway coefficient (nan = uniform grid)")
    p.add_argument("--progressive", default=None,
                   help="comma ladder of K values, e.g. '32,16,8': stage 1 "
                        "distills K0 from the CFG teacher; later stages halve "
                        "with the previous (single-branch) student as teacher. "
                        "--distill-steps applies per stage. Overrides "
                        "--student-steps (final K = last ladder entry).")
    p.add_argument("--knot-weighting", default="none", choices=["none", "adaptive"],
                   help="per-knot loss normalization (sharp-field lever)")
    p.add_argument("--loss-chunk", type=int, default=-1,
                   help="knots per gradient chunk in the K-fold loss (-1 = "
                        "auto: largest divisor of K with chunk*batch <= 16 "
                        "rows, the proven base-geometry grad budget; 0 = "
                        "single shot)")
    p.add_argument("--deepen", type=int, default=1,
                   help="student depth multiplier (capacity sweep): inserted "
                        "blocks start as exact identity (zeroed adaLN gates)")
    p.add_argument("--solve-cache", default=None)
    p.add_argument("--out", default="DISTILL.json")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.geometry == "tiny":
        cfg = TINY
        bucket = args.bucket or 128
        cond_frames = args.cond_frames or 24
    else:
        cfg = DiTConfig.base() if args.geometry == "base" else DiTConfig.small()
        bucket = args.bucket or 1024
        cond_frames = args.cond_frames or 128

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    teacher = init_dit(jax.random.PRNGKey(0), cfg)
    tpath = (os.path.join(args.solve_cache, "teacher.npz") if args.solve_cache else None)
    if tpath and os.path.exists(tpath):
        from f5tts_tpu.models.convert import load_params_npz

        teacher = load_params_npz(tpath)
        print(f"loaded teacher from {tpath}", flush=True)
    else:
        print(f"toy-training {args.toy_train} steps at {args.geometry}...", flush=True)
        t0 = time.time()
        teacher = toy_train(teacher, cfg, args.toy_train)
        print(f"  toy-train {time.time() - t0:.0f}s", flush=True)
        if tpath:
            from f5tts_tpu.models.convert import save_params_npz

            os.makedirs(args.solve_cache, exist_ok=True)
            save_params_npz(tpath, jax.tree.map(lambda x: np.asarray(x), teacher))

    cond, lens, text, durations, seeds = build_prompts(cfg, args.prompts, bucket, cond_frames)
    gen_mask = ((np.arange(bucket)[None, :] >= lens[:, None])
                & (np.arange(bucket)[None, :] < durations[:, None]))
    y0 = sample_noise_from_seeds(jnp.asarray(seeds), bucket, cfg.mel_dim,
                                 jnp.asarray(durations), dtype)

    SEG = int(os.environ.get("QH_SEGMENT_STEPS", 64))

    def solve(params, sampler, model_cfg=None):
        mcfg = model_cfg or cfg
        steps = sampler.steps
        if steps <= SEG:
            out = sample_cfm(params, mcfg, cond=jnp.asarray(cond), cond_lens=jnp.asarray(lens),
                             text=jnp.asarray(text), duration=jnp.asarray(durations),
                             sampler=sampler, y0=y0, compute_dtype=dtype)
        else:
            out = y0
            for a in range(0, steps, SEG):
                b = min(a + SEG, steps)
                out = sample_cfm(params, mcfg, cond=jnp.asarray(cond), cond_lens=jnp.asarray(lens),
                                 text=jnp.asarray(text), duration=jnp.asarray(durations),
                                 sampler=sampler, y0=jnp.asarray(out), compute_dtype=dtype,
                                 knot_range=(a, b), paste_back=(b == steps))
                out = np.asarray(out)
                print(f"  truth knots {a}..{b}", flush=True)
        return np.asarray(out, np.float32)

    def cached(name, fn):
        if args.solve_cache:
            os.makedirs(args.solve_cache, exist_ok=True)
            path = os.path.join(args.solve_cache, f"{name}.npy")
            if os.path.exists(path):
                print(f"loaded {name} from cache", flush=True)
                return np.load(path)
            out = fn()
            np.save(path, out)
            return out
        return fn()

    t0 = time.time()
    truth = cached("truth", lambda: solve(teacher, CONFIGS["truth"]))
    print(f"truth solved {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    recipe = cached("recipe", lambda: solve(teacher, CONFIGS["base"]))
    print(f"recipe solved {time.time() - t0:.0f}s", flush=True)
    recipe_err = quality_report(recipe, truth, gen_mask)["mel_l2"]
    print(f"recipe err-to-truth: {recipe_err:.5f}", flush=True)

    prompt_fn = make_prompt_fn(cfg, args.distill_batch, bucket, cond_frames)
    ddtype = dtype if args.distill_dtype is None else (
        jnp.bfloat16 if args.distill_dtype == "bf16" else jnp.float32)

    student_cfg = cfg
    student_init = teacher
    if args.deepen > 1:
        from f5tts_tpu.train.distill import deepen_student

        student_init, student_cfg = deepen_student(teacher, cfg, args.deepen)
        print(f"capacity sweep: student depth {cfg.depth} -> {student_cfg.depth} "
              f"(identity-init copies)", flush=True)

    ladder = ([int(k) for k in args.progressive.split(",")] if args.progressive
              else [args.student_steps])
    args.student_steps = ladder[-1]
    t0 = time.time()
    cur_teacher, cur_teacher_single = student_init, False
    for stage, K in enumerate(ladder):
        if args.loss_chunk == -1:  # auto: largest divisor of K, <= 16 grad rows
            kc = max(c for c in range(1, K + 1)
                     if K % c == 0 and c * args.distill_batch <= 16)
        else:
            kc = args.loss_chunk
        dcfg = DistillConfig(
            student_steps=K, substeps=args.substeps,
            learning_rate=args.lr, lr_decay_steps=args.distill_steps,
            sway_sampling_coef=None if np.isnan(args.sway) else args.sway,
            teacher_single_branch=cur_teacher_single,
            knot_weighting=args.knot_weighting,
            loss_chunk=0 if kc >= K else kc,
        )
        print(f"distilling stage {stage + 1}/{len(ladder)}: K={K} m={args.substeps} "
              f"teacher={'student' if cur_teacher_single else 'cfg-pair'} "
              f"for {args.distill_steps} steps...", flush=True)
        student = distill(cur_teacher, student_cfg, dcfg, prompt_fn,
                          args.distill_steps, compute_dtype=ddtype)
        cur_teacher, cur_teacher_single = student, True
    print(f"  distill {time.time() - t0:.0f}s", flush=True)

    # a deepened student's forward costs deepen-x FLOPs: account in "forwards"
    fwd_scale = args.deepen
    rows = []
    for name, params, sampler, fwd, mcfg in (
        ("recipe euler-32", teacher, CONFIGS["base"], 64, cfg),
        (f"student K={args.student_steps}", student, student_sampler(dcfg),
         args.student_steps * fwd_scale, student_cfg),
        ("teacher euler@K (ablation)", teacher,
         CONFIGS["base"].__class__(steps=args.student_steps, cfg_strength=2.0,
                                   sway_sampling_coef=-1.0), 2 * args.student_steps, cfg),
    ):
        out = solve(params, sampler, mcfg) if name != "recipe euler-32" else recipe
        rep = quality_report(out, truth, gen_mask)
        ratio = rep["mel_l2"] / max(recipe_err, 1e-12)
        rows.append({"name": name, "forwards": fwd, "mel_l2": rep["mel_l2"],
                     "mcd_db": rep["mcd_db"], "x_recipe_err": ratio,
                     "certified": bool(ratio <= 1.0 + 1e-9)})
        print(f"| {name} | {fwd} | {rep['mel_l2']:.5f} | {ratio:.3f} | "
              f"{'YES' if ratio <= 1.0 else 'no'} |", flush=True)

    result = {
        "geometry": args.geometry, "toy_train": args.toy_train,
        "student_steps": args.student_steps, "substeps": args.substeps,
        "distill_steps": args.distill_steps, "distill_batch": args.distill_batch,
        "dtype": args.dtype, "bucket": bucket, "recipe_err": recipe_err,
        "progressive": args.progressive, "knot_weighting": args.knot_weighting,
        "deepen": args.deepen, "sway": args.sway,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
