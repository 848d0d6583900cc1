"""Single-utterance / long-form inference CLI.

Capability parity with the reference CLI (``infer/infer_cli.py``): TOML config
with flag overrides, model registry (F5TTS_Base / F5TTS_Small / E2TTS_Base),
multi-voice ``[voice]`` tags in the gen text, silence removal. Runs on real
checkpoints (torch ``.pt``/``.safetensors`` via the converter) or ``--demo-tiny``
(random-init tiny model) for environment smoke tests without weights.
"""

from __future__ import annotations

import argparse
import re
import sys

import numpy as np


def add_engine_args(p: argparse.ArgumentParser, short: bool = False) -> None:
    """Every flag ``build_engine`` reads off the args namespace — shared by
    the infer / batch CSV / speech-edit CLIs so a knob added here reaches all
    three (a parser missing any of these crashes build_engine)."""
    m = ["-m"] if short else []
    c = ["-p"] if short else []
    v = ["-v"] if short else []
    p.add_argument(*m, "--model", default="F5TTS_Base", help="F5TTS_Base | F5TTS_Small | E2TTS_Base | E2TTS_Small")
    p.add_argument(*c, "--ckpt-file", default="", help="torch .pt/.safetensors DiT checkpoint")
    p.add_argument(*v, "--vocab-file", default="", help="vocab.txt (one char per line)")
    p.add_argument("--vocoder", default="vocos", choices=["vocos", "bigvgan"],
                   help="vocoder family (reference --vocoder_name; bigvgan implies the bigvgan mel flavor)")
    p.add_argument("--vocoder-ckpt", default="", help="vocoder torch checkpoint (vocos pytorch_model.bin / bigvgan generator)")
    p.add_argument("--nfe", type=int, default=0,
                   help="model evals per guidance branch (reference nfe_step); 0 = method default (euler 32, RK2 20)")
    p.add_argument("--method", default="auto", choices=["auto", "euler", "midpoint", "heun", "ralston", "rk4"],
                   help="ODE integrator; auto = ralston (the certified reduced-compute default, BENCH.md) "
                        "unless an euler-only knob (--cfg-interval/--cfg-cache/--time-grid) is set; "
                        "euler + --nfe 32 = the exact reference recipe")
    p.add_argument("--cfg-strength", type=float, default=2.0)
    p.add_argument("--sway", type=float, default=-1.0)
    p.add_argument("--time-grid", default="", help="comma list of ODE time knots 0..1 (pruned-step schedules, overrides --nfe/--sway)")
    p.add_argument("--cfg-interval", default="", help="lo,hi guidance interval: CFG only on steps with t in [lo,hi) — one forward instead of two elsewhere (arXiv:2404.07724)")
    p.add_argument("--cfg-cache", type=int, default=1, help="guidance caching period k: refresh the null branch every k-th step, reuse in between (guidance stays on every step); 1 = off")
    p.add_argument("--quality", default="default", choices=["default", "strict"],
                   help="strict: monitor the embedded RK2 error estimate on-trajectory and "
                        "auto-escalate to the exact reference recipe (euler-32) when it "
                        "exceeds the calibrated threshold (sharp-field guard, BENCH.md)")
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--cross-fade", type=float, default=0.15)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--attn", default="auto", choices=["auto", "xla", "flash"],
                   help="auto = flash kernels on TPU, XLA elsewhere")
    p.add_argument("--demo-tiny", action="store_true", help="random-init tiny model (no checkpoint smoke test)")
    p.add_argument("--random-init", action="store_true",
                   help="random-init at the REAL --model geometry (kernel/shape smoke without checkpoints)")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("f5tpu-infer", description="TPU-native F5-TTS inference")
    p.add_argument("-c", "--config", default=None, help="TOML config file (flags override)")
    add_engine_args(p, short=True)
    p.add_argument("-r", "--ref-audio", default="", help="reference audio wav")
    p.add_argument("-s", "--ref-text", default="", help="reference transcript")
    p.add_argument("-t", "--gen-text", default="", help="text to synthesize")
    p.add_argument("-f", "--gen-file", default="", help="file with text to synthesize")
    p.add_argument("-o", "--output", default="out.wav")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--fix-duration", type=float, default=None, help="total duration seconds")
    p.add_argument("--remove-silence", action="store_true")
    return p


def load_config(args):
    """TOML config with flag override; ``[voices.NAME]`` tables define extra
    reference voices for ``[name]`` tags in the gen text (``infer_cli.py``
    multi-voice contract)."""
    args.voices = {}
    if not args.config:
        return args
    import os
    import tomllib

    with open(args.config, "rb") as f:
        cfg = tomllib.load(f)
    args.voices = cfg.pop("voices", {})
    for k, v in cfg.items():
        k = k.replace("-", "_")
        if hasattr(args, k) and parser_default(k) == getattr(args, k):
            setattr(args, k, v)

    # resolve relative asset paths against the toml's directory so the
    # committed quickstart (`--config examples/basic.toml`) works from any cwd
    base = os.path.dirname(os.path.abspath(args.config))

    def resolve(p):
        if p and not os.path.isabs(p) and not os.path.exists(p):
            cand = os.path.join(base, p)
            if os.path.exists(cand):
                return cand
        return p

    for k in ("ckpt_file", "vocab_file", "vocoder_ckpt", "ref_audio", "gen_file"):
        setattr(args, k, resolve(getattr(args, k, None)))
    for spec in args.voices.values():
        if "ref_audio" in spec:
            spec["ref_audio"] = resolve(spec["ref_audio"])
    return args


_PARSER = build_argparser()


def parser_default(dest):
    return _PARSER.get_default(dest)


def build_engine(args):
    import jax

    if args.attn == "auto":
        args.attn = "flash" if jax.default_backend() == "tpu" else "xla"

    from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
    from f5tts_tpu.models.dit import DiTConfig, init_dit
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos
    from f5tts_tpu.ops.mel import MelConfig
    from f5tts_tpu.sampling.euler import SamplerConfig
    from f5tts_tpu.sampling.euler import parse_cfg_interval as _parse_cfg_interval
    from f5tts_tpu.text.tokenizer import Tokenizer

    engine_fns = {}
    vocoder_kw = {}
    use_bigvgan = getattr(args, "vocoder", "vocos") == "bigvgan"
    mel_flavor = "bigvgan" if use_bigvgan else "vocos"  # paired mel front-end (utils_infer.py:92-130)
    if args.demo_tiny:
        mel_cfg = MelConfig(n_mels=20, flavor=mel_flavor)
        # honor --vocab-file (e.g. the bundled multi-script examples/vocab.txt)
        # so Indic text exercises real token ids instead of collapsing to unk
        tok = (Tokenizer.from_file(args.vocab_file) if args.vocab_file
               else Tokenizer({" ": 0, **{chr(i): i - 31 for i in range(33, 127)}}))
        dit_cfg = DiTConfig(
            dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
            text_num_embeds=tok.vocab_size if args.vocab_file else 256,
            text_dim=32, conv_layers=1, max_pos=1024, attn_impl=args.attn,
        )
        voc_cfg = VocosConfig(input_channels=20, dim=48, intermediate_dim=96, num_layers=2)
        dit_params = init_dit(jax.random.PRNGKey(0), dit_cfg)
        if use_bigvgan:
            from f5tts_tpu.models.bigvgan import BigVGANConfig, init_bigvgan

            bcfg = BigVGANConfig(mel_dim=20, upsample_initial_channel=32,
                                 upsample_rates=(4, 4, 4, 4), upsample_kernel_sizes=(8, 8, 8, 8),
                                 resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),))
            voc_params = init_bigvgan(jax.random.PRNGKey(1), bcfg)
            vocoder_kw = {"vocoder_type": "bigvgan", "bigvgan": bcfg}
        else:
            voc_params = init_vocos(jax.random.PRNGKey(1), voc_cfg)
    elif getattr(args, "random_init", False):
        # real geometry, random weights: kernel/shape smoke at the actual
        # model size without checkpoints (zero-egress environments); audio is
        # noise, the compiled programs are the real ones
        mel_cfg = MelConfig(flavor=mel_flavor)
        tok = (Tokenizer.from_file(args.vocab_file) if args.vocab_file
               else Tokenizer({" ": 0, **{chr(i): i - 31 for i in range(33, 127)}}))
        if args.model.startswith("E2TTS"):
            from f5tts_tpu.models.unett import UNetTConfig, init_unett, unett_embed, unett_forward

            ubase = UNetTConfig.small() if args.model == "E2TTS_Small" else UNetTConfig.base()
            dit_cfg = UNetTConfig(**{**ubase.__dict__, "text_num_embeds": tok.vocab_size, "attn_impl": args.attn})
            dit_params = init_unett(jax.random.PRNGKey(0), dit_cfg)
            engine_fns = {"forward_fn": unett_forward, "embed_fn": unett_embed}
        else:
            base = DiTConfig.small() if args.model == "F5TTS_Small" else DiTConfig.base()
            dit_cfg = DiTConfig(**{**base.__dict__, "text_num_embeds": tok.vocab_size, "attn_impl": args.attn})
            dit_params = init_dit(jax.random.PRNGKey(0), dit_cfg)
        voc_cfg = VocosConfig()
        voc_params = init_vocos(jax.random.PRNGKey(1), voc_cfg)
    else:
        if not args.ckpt_file or not args.vocab_file or not args.vocoder_ckpt:
            sys.exit("need --ckpt-file, --vocab-file and --vocoder-ckpt (or --demo-tiny / --random-init)")
        mel_cfg = MelConfig(flavor=mel_flavor)
        tok = Tokenizer.from_file(args.vocab_file)
        voc_cfg = VocosConfig()
        from f5tts_tpu.models.convert import load_torch_state_dict, load_vocos_checkpoint

        if use_bigvgan:
            from f5tts_tpu.models.bigvgan import BigVGANConfig, convert_bigvgan

            bcfg = BigVGANConfig(mel_dim=mel_cfg.n_mels)
            voc_params = convert_bigvgan(load_torch_state_dict(args.vocoder_ckpt), bcfg)
            vocoder_kw = {"vocoder_type": "bigvgan", "bigvgan": bcfg}
        else:
            voc_params = load_vocos_checkpoint(args.vocoder_ckpt, voc_cfg)
        import os as _os

        if args.model.startswith("E2TTS"):
            from f5tts_tpu.models.convert import convert_e2_unett, load_trained_checkpoint
            from f5tts_tpu.models.unett import UNetTConfig, unett_embed, unett_forward

            ubase = UNetTConfig.small() if args.model == "E2TTS_Small" else UNetTConfig.base()
            dit_cfg = UNetTConfig(
                **{**ubase.__dict__, "text_num_embeds": tok.vocab_size, "attn_impl": args.attn}
            )
            if _os.path.isdir(args.ckpt_file):  # this framework's orbax train dir
                dit_params = load_trained_checkpoint(args.ckpt_file, dit_cfg)
            else:
                dit_params = convert_e2_unett(load_torch_state_dict(args.ckpt_file), dit_cfg)
            engine_fns = {"forward_fn": unett_forward, "embed_fn": unett_embed}
        else:
            from f5tts_tpu.models.convert import load_f5_checkpoint

            base = DiTConfig.small() if args.model == "F5TTS_Small" else DiTConfig.base()
            dit_cfg = DiTConfig(**{**base.__dict__, "text_num_embeds": tok.vocab_size, "attn_impl": args.attn})
            # torch .pt/.safetensors file, or an orbax train dir from f5tpu-train
            dit_params = load_f5_checkpoint(args.ckpt_file, dit_cfg)

    from f5tts_tpu.sampling.euler import DEFAULT_NFE, default_time_grid, nfe_to_steps

    method = args.method
    if method == "auto":
        # euler-only knobs force the euler integrator; otherwise ship the
        # certified ralston default (engine.EngineConfig docstring / BENCH.md)
        method = "euler" if (args.cfg_interval or args.cfg_cache > 1 or args.time_grid) else "ralston"
    nfe = args.nfe or DEFAULT_NFE[method]
    steps = nfe_to_steps(nfe, method)
    engine_cfg = EngineConfig(
        mel=mel_cfg, vocoder=voc_cfg,
        sampler=SamplerConfig(
            steps=steps, method=method,
            cfg_strength=args.cfg_strength, sway_sampling_coef=args.sway,
            time_grid=(tuple(float(v) for v in args.time_grid.split(","))
                       if args.time_grid else default_time_grid(method, steps)),
            cfg_interval=_parse_cfg_interval(args.cfg_interval) if args.cfg_interval else (0.0, 1.0),
            cfg_cache_period=args.cfg_cache,
        ),
        compute_dtype=args.dtype,
        cross_fade_duration=args.cross_fade,
        speed=args.speed,
        **vocoder_kw,
    )
    return TTSEngine(dit_params, dit_cfg, voc_params, tok, engine_cfg, **engine_fns)


def main(argv=None):
    from f5tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = load_config(_PARSER.parse_args(argv))

    gen_text = args.gen_text
    if args.gen_file:
        gen_text = open(args.gen_file, encoding="utf-8").read()
    if not gen_text:
        sys.exit("no --gen-text/--gen-file given")

    from f5tts_tpu.audio.io import read_wav, write_wav
    from f5tts_tpu.audio.preprocess import clip_ref_audio, ensure_sentence_punctuation
    from f5tts_tpu.audio.stitch import crossfade_concat

    if args.ref_audio:
        ref_audio, ref_sr = read_wav(args.ref_audio)
        ref_audio = clip_ref_audio(ref_audio, ref_sr)
    elif args.demo_tiny:
        ref_sr = 24000
        ref_audio = (np.sin(2 * np.pi * 220 * np.arange(ref_sr) / ref_sr) * 0.1).astype(np.float32)
    else:
        sys.exit("need --ref-audio")
    ref_text = ensure_sentence_punctuation(args.ref_text or "reference audio.")

    engine = build_engine(args)

    # multi-voice registry: [voices.NAME] tables from the toml config
    voices = {"main": (ref_audio, ref_sr, ref_text)}
    for name, spec in getattr(args, "voices", {}).items():
        v_audio, v_sr = read_wav(spec["ref_audio"])
        v_audio = clip_ref_audio(v_audio, v_sr)
        voices[name] = (v_audio, v_sr, ensure_sentence_punctuation(spec.get("ref_text", "")))

    # [voice] / {Style} tag parsing is shared with the server (one regex, one
    # contract — hyphen/dot voice names included); tags that don't resolve to
    # a known voice stay in the text verbatim, flagged here for CLI users
    from f5tts_tpu.text.chunker import split_style_segments

    known = {v.lower() for v in voices} | {"regular"}
    for m in re.finditer(r"[\[{]([\w.-]+)[\]}]", gen_text):
        if m.group(1).lower() not in known:
            print(f"note: [{m.group(1)}] is not a known voice; leaving it as text", file=sys.stderr)

    waves = []
    for voice, seg_text in split_style_segments(gen_text, voices, default="main"):
        v_audio, v_sr, v_text = voices[voice]
        wave, sr, _ = engine.synthesize(
            seg_text, v_audio, v_sr, v_text,
            speed=args.speed, fix_duration_secs=args.fix_duration,
            nfe_step=args.nfe or None, cfg_strength=args.cfg_strength, seed=args.seed,
            cross_fade_duration=args.cross_fade, quality=args.quality,
        )
        waves.append(wave)
    if not waves:
        sys.exit("no synthesizable text left after voice-tag parsing")
    final = crossfade_concat(waves, 0.0) if len(waves) > 1 else waves[0]

    if args.remove_silence:
        from f5tts_tpu.audio.preprocess import remove_long_silences

        final = remove_long_silences(final, sr)

    write_wav(args.output, final, sr)
    print(f"wrote {args.output}: {len(final) / sr:.2f}s at {sr} Hz")


if __name__ == "__main__":
    main()
