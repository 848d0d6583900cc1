"""Headline benchmark: realtime factor of the full TTS stack on one chip.

Measures the BASELINE north-star metric — audio-seconds generated per second
per chip (config #2 geometry: F5-TTS Base DiT + Vocos, batch 8, bf16, CFG 2.0)
at the SHIPPING sampler default (ralston RK2 @ NFE 20/branch, certified
at-or-better-than-recipe solver accuracy in BENCH.md; the exact reference
recipe is BENCH_METHOD=euler BENCH_NFE=32) — and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
``vs_baseline`` is vs. the ">50x realtime per chip" target (reference publishes
no numbers of its own — BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from f5tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    # Measurement integrity (round-4 postmortem: the official r4 capture posted
    # a 2.24 CPU-grade number with no indication the chip wasn't executing).
    # Refuse to post a headline from a non-TPU backend unless explicitly
    # overridden for local debugging.
    backend = jax.default_backend()
    if backend != "tpu" and os.environ.get("BENCH_ALLOW_CPU") != "1":
        print(json.dumps({"metric": "audio_s_per_s_per_chip", "value": 0.0,
                          "unit": "audio-seconds/second", "vs_baseline": 0.0,
                          "error": f"backend={backend}, not tpu; set BENCH_ALLOW_CPU=1 to override"}))
        sys.exit(1)

    from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
    from f5tts_tpu.models.dit import DiTConfig, init_dit
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos
    from f5tts_tpu.text.tokenizer import Tokenizer

    from f5tts_tpu.sampling.euler import DEFAULT_NFE, nfe_to_steps

    batch = int(os.environ.get("BENCH_BATCH", 8))
    n_frames = int(os.environ.get("BENCH_FRAMES", 1024))
    # default = the certified serving recipe (ralston RK2 @ NFE 20/branch,
    # BENCH.md round-2 quality certification). The exact reference recipe is
    # BENCH_METHOD=euler BENCH_NFE=32. BENCH_NFE counts model evals/branch.
    method = os.environ.get("BENCH_METHOD")
    if method is None:
        # guidance caching / interval are euler-path knobs; mirror the
        # CLI/server behavior (cli/infer.py, serve/server.py force euler for
        # them) instead of raising against the ralston default
        euler_knobs = int(os.environ.get("BENCH_CFG_CACHE", 1)) > 1 or os.environ.get("BENCH_CFG_INTERVAL")
        method = "euler" if euler_knobs else "ralston"
    nfe = int(os.environ.get("BENCH_NFE", 0)) or DEFAULT_NFE[method]
    steps = nfe_to_steps(nfe, method)
    ref_frames = int(os.environ.get("BENCH_REF_FRAMES", 128))
    iters = int(os.environ.get("BENCH_ITERS", 3))

    attn_impl = os.environ.get("BENCH_ATTN", "flash")
    model = os.environ.get("BENCH_MODEL", "f5tts")  # f5tts (DiT) | e2tts (UNetT, 1.7x FLOPs)
    engine_fns = {}
    if model == "e2tts":
        from f5tts_tpu.models.unett import UNetTConfig, init_unett, unett_embed, unett_forward

        dit_cfg = UNetTConfig(**{**UNetTConfig.base().__dict__, "attn_impl": attn_impl})
        dit_params = init_unett(jax.random.PRNGKey(0), dit_cfg)
        engine_fns = {"forward_fn": unett_forward, "embed_fn": unett_embed}
    else:
        dit_cfg = DiTConfig(**{**DiTConfig.base().__dict__, "attn_impl": attn_impl})
        dit_params = init_dit(jax.random.PRNGKey(0), dit_cfg)
    voc_cfg = VocosConfig()
    tok = Tokenizer({" ": 0, **{chr(i): i - 31 for i in range(33, 127)}})
    voc_params = init_vocos(jax.random.PRNGKey(1), voc_cfg)

    quant = "int8" if os.environ.get("BENCH_QUANT") == "1" else "none"
    from f5tts_tpu.sampling.euler import SamplerConfig, parse_cfg_interval

    iv = os.environ.get("BENCH_CFG_INTERVAL")  # "lo,hi" guidance interval
    interval = parse_cfg_interval(iv) if iv else (0.0, 1.0)
    cache = int(os.environ.get("BENCH_CFG_CACHE", 1))  # null-branch refresh period
    cache_mode = os.environ.get("BENCH_CFG_CACHE_MODE", "hold")  # hold | extrapolate
    from f5tts_tpu.sampling.euler import default_time_grid

    sampler = SamplerConfig(steps=steps, method=method, cfg_interval=interval,
                            cfg_cache_period=cache, cfg_cache_mode=cache_mode,
                            time_grid=default_time_grid(method, steps))
    cfg = EngineConfig(
        duration_buckets=(n_frames,), batch_buckets=(batch,), text_pad=512,
        compute_dtype="bfloat16", quantization=quant, sampler=sampler,
    )
    engine = TTSEngine(dit_params, dit_cfg, voc_params, tok, cfg, **engine_fns)

    # BENCH_CFG=0 measures the DISTILLED-STUDENT serving shape: single-branch
    # solve (guidance baked into the weights), one forward per eval — the
    # certified base-geometry student (DISTILL_BASE*.json) serves exactly this
    # program via SamplerConfig(cfg_strength=0, time_grid=student grid)
    cfg_strength = float(os.environ.get("BENCH_CFG", 2.0))
    fn = engine._compiled(n_frames, batch, cfg.text_pad, steps, cfg_strength)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((batch, n_frames, 100)), jnp.float32)
    cond_lens = jnp.full((batch,), ref_frames, jnp.int32)
    text = jnp.asarray(rng.integers(0, 90, (batch, cfg.text_pad)), jnp.int32)
    duration = jnp.full((batch,), n_frames, jnp.int32)
    seeds = jnp.arange(batch, dtype=jnp.int32)

    def run_once():
        gen, wave = fn(dit_params, voc_params, cond, cond_lens, text, duration, seeds)
        # force full execution + host sync: block_until_ready alone is not a
        # reliable barrier through the remote-execution tunnel
        return float(jnp.sum(wave[:, :64]))

    t_compile0 = time.perf_counter()
    run_once()  # warmup/compile
    compile_s = time.perf_counter() - t_compile0

    def timed_iters():
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            checksum = run_once()
            times.append(time.perf_counter() - t0)
            assert np.isfinite(checksum)
        return times

    iter_times = timed_iters()
    # sanity: if per-iteration dispersion exceeds 2x, the tunnel / device was
    # unstable during capture — retry once and keep the better (tighter) set
    if max(iter_times) > 2.0 * min(iter_times):
        print(f"warning: iteration dispersion {min(iter_times):.3f}-{max(iter_times):.3f}s; retrying",
              file=sys.stderr)
        retry = timed_iters()
        if (max(retry) / max(min(retry), 1e-9)) < (max(iter_times) / max(min(iter_times), 1e-9)):
            iter_times = retry
    # MEDIAN, not mean: a single host-contended dispatch (another process
    # spiking the 2-core host mid-capture) inflates one iteration while the
    # device program is unchanged — round-5 measured iter_s [2.215, 1.444,
    # 1.443] under exactly that; the mean would post 0.90x for a healthy
    # 1.06x program. All per-iter times are still recorded in the JSON.
    dt = float(np.median(iter_times))

    frames_per_second_of_audio = 24000 / 256  # 93.75
    audio_seconds = batch * (n_frames - ref_frames) / frames_per_second_of_audio
    rtf = audio_seconds / dt
    result = {
        "metric": "audio_s_per_s_per_chip",
        "value": round(rtf, 2),
        "unit": "audio-seconds/second",
        "vs_baseline": round(rtf / 50.0, 3),
        "backend": backend,
        "compile_s": round(compile_s, 2),
        "iter_s": [round(t, 4) for t in iter_times],
    }
    if cfg_strength != 2.0:
        # a BENCH_CFG=0 run measures the single-branch (distilled-student)
        # program — tag it so it can't be mistaken for the CFG=2 headline
        result["cfg_strength"] = cfg_strength
        result["mode"] = "single_branch" if cfg_strength == 0 else "nonstandard_cfg"
    result_line = json.dumps(result)

    if os.environ.get("BENCH_PARITY") == "1":
        # numerical guard (opt-in: costs two extra small compiles): the benched
        # serving path (bf16 + flash + fused conv-pos) must agree with the
        # f32/XLA-everything path at small shapes — a perf change that silently
        # breaks numerics fails here instead of posting a number.
        from f5tts_tpu.eval.quality import mel_l2
        from f5tts_tpu.sampling.euler import sample_cfm

        # transport flakes through the remote-compile tunnel must not eat the
        # measurement — only a NUMERIC mismatch aborts
        pb, pn, pref = 2, 256, 64
        pcond = jnp.asarray(rng.standard_normal((pb, pn, 100)), jnp.float32)
        plens = jnp.full((pb,), pref, jnp.int32)
        ptext = jnp.asarray(rng.integers(0, 90, (pb, 48)), jnp.int32)
        pdur = jnp.full((pb,), pn, jnp.int32)
        pseeds = jnp.arange(pb, dtype=jnp.int32)
        psampler = SamplerConfig(steps=4, cfg_strength=2.0)
        try:
            outs = {}
            for name, a_impl, cp_impl, dtype in (
                ("serving", attn_impl, "fused", jnp.bfloat16),  # engine default on-chip
                ("referencepath", "xla", "xla", jnp.float32),
            ):
                pcfg = type(dit_cfg)(**{**dit_cfg.__dict__, "attn_impl": a_impl, "conv_pos_impl": cp_impl})
                outs[name] = np.asarray(jax.jit(
                    lambda c, cl, t, d, s, _pc=pcfg, _dt=dtype: sample_cfm(
                        dit_params, _pc, cond=c, cond_lens=cl, text=t, duration=d,
                        sampler=psampler, seeds=s, compute_dtype=_dt, **engine_fns)
                )(pcond, plens, ptext, pdur, pseeds), np.float32)
            gen_mask = np.broadcast_to((np.arange(pn) >= pref)[None], (pb, pn))
            parity = mel_l2(outs["serving"], outs["referencepath"], gen_mask)
            print(f"parity mel_l2 (bf16+kernels vs f32+xla, 4 steps): {parity:.4f}", file=sys.stderr)
            assert parity < 0.5, f"serving path diverged from reference path: mel_l2={parity}"
        except AssertionError:
            raise
        except Exception as e:
            print(f"parity check skipped (environment error: {type(e).__name__}: {e})", file=sys.stderr)

    print(result_line)


if __name__ == "__main__":
    main()
