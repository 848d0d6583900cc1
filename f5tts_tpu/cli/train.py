"""Training CLI: flow-matching training with frame-packed batches on a
(data, model) mesh. Capability parity with the reference's Accelerate trainer
entry (``model/trainer.py`` + ``configs/*.yaml``), TPU-native."""

from __future__ import annotations

import argparse
import json

MODEL_NAMES = ("F5TTS_Base", "F5TTS_Small", "E2TTS_Base", "E2TTS_Small", "demo_tiny")


def resolve_model_cfg(name: str, vocab_file: str = ""):
    """Model registry (``infer/infer_cli.py:134-159`` + ``configs/*.yaml``):
    F5TTS_* -> DiT, E2TTS_* -> UNetT; vocab size from the vocab file."""
    from f5tts_tpu.models.cfm import CFMConfig
    from f5tts_tpu.models.dit import DiTConfig
    from f5tts_tpu.models.unett import UNetTConfig

    if name == "demo_tiny":
        return CFMConfig(
            model=DiTConfig(
                dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
                text_num_embeds=256, text_dim=32, conv_layers=1, max_pos=512,
            )
        )
    registry = {
        "F5TTS_Base": DiTConfig.base,
        "F5TTS_Small": DiTConfig.small,
        "E2TTS_Base": UNetTConfig.base,
        "E2TTS_Small": UNetTConfig.small,
    }
    base = registry[name]()
    if vocab_file:
        from f5tts_tpu.text.tokenizer import Tokenizer

        vocab_size = Tokenizer.from_file(vocab_file).vocab_size
        base = type(base)(**{**base.__dict__, "text_num_embeds": vocab_size})
    return CFMConfig(model=base)


def main(argv=None):
    p = argparse.ArgumentParser("f5tpu-train")
    p.add_argument("--dataset-dir", default="", help="dir with {mel .npy, text .txt} pairs or a manifest.jsonl")
    p.add_argument("--vocab-file", default="")
    p.add_argument("--model", default="F5TTS_Base", choices=list(MODEL_NAMES))
    p.add_argument("--checkpoint-dir", default="ckpts/run0")
    p.add_argument("--learning-rate", type=float, default=7.5e-5)
    p.add_argument("--warmup-updates", type=int, default=20000)
    p.add_argument("--total-updates", type=int, default=1200000)
    p.add_argument("--batch-frames", type=int, default=38400)
    p.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batches per optimizer update (use with a reduced --batch-frames to fit HBM)")
    p.add_argument("--optimizer", default="adamw", choices=["adamw", "adafactor"],
                   help="adafactor = factored second moments, ~half the optimizer HBM "
                        "(the reference's bnb 8-bit AdamW role; bitsandbytes is CUDA-only)")
    p.add_argument("--max-samples", type=int, default=64)
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--attn", default="auto", choices=["auto", "xla", "flash"],
                   help="auto = differentiable flash kernels single-device (42%% faster, BENCH.md), xla under a mesh")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--save-every", type=int, default=10000)
    p.add_argument("--sample-every", type=int, default=0,
                   help="synthesize fixed prompts from the EMA weights every N updates "
                        "(reference trainer.py:341-366 quality signal); 0 = off")
    p.add_argument("--sample-nfe", type=int, default=16)
    p.add_argument("--sample-vocoder", default="",
                   help="converted Vocos .npz: the hook also writes 24 kHz wavs "
                        "(without it: generated-mel .npy + RMS metrics only)")
    p.add_argument("--smoke", action="store_true", help="tiny model + synthetic data, a few steps")
    p.add_argument("--train-config", default="", help="YAML training config (configs/*.yaml); flags override")
    args = p.parse_args(argv)

    if args.train_config:
        import yaml

        with open(args.train_config, encoding="utf-8") as f:
            ycfg = yaml.safe_load(f)
        defaults = {a.dest: a.default for a in p._actions}
        mapping = {
            "model": ycfg.get("model", {}).get("name"),
            "vocab_file": ycfg.get("model", {}).get("vocab_file"),
            "learning_rate": ycfg.get("optim", {}).get("learning_rate"),
            "warmup_updates": ycfg.get("optim", {}).get("warmup_updates"),
            "total_updates": ycfg.get("optim", {}).get("total_updates"),
            "batch_frames": ycfg.get("optim", {}).get("batch_frames"),
            "grad_accum": ycfg.get("optim", {}).get("grad_accum"),
            # reference yamls carry bnb_optimizer (model/trainer.py:123-128);
            # map it to the TPU-native reduced-memory equivalent
            "optimizer": ycfg.get("optim", {}).get(
                "optimizer", "adafactor" if ycfg.get("optim", {}).get("bnb_optimizer") else None),
            "max_samples": ycfg.get("optim", {}).get("max_samples"),
            "checkpoint_dir": ycfg.get("ckpts", {}).get("checkpoint_dir"),
            "save_every": ycfg.get("ckpts", {}).get("save_every"),
            "log_every": ycfg.get("ckpts", {}).get("log_every"),
        }
        for dest, val in mapping.items():
            if val not in (None, "") and getattr(args, dest) == defaults.get(dest):
                setattr(args, dest, val)

    import jax

    from f5tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from f5tts_tpu.parallel.mesh import build_mesh
    from f5tts_tpu.train.trainer import TrainConfig, Trainer

    name = "demo_tiny" if args.smoke else args.model
    model_cfg = resolve_model_cfg(name, args.vocab_file if name != "demo_tiny" else "")

    train_cfg = TrainConfig(
        learning_rate=args.learning_rate, warmup_updates=args.warmup_updates,
        total_updates=args.total_updates, batch_frames=args.batch_frames, seed=args.seed,
        max_grad_accum=args.grad_accum, optimizer=args.optimizer,
    )
    mesh = build_mesh(model_parallel=args.model_parallel) if jax.device_count() > 1 else None

    attn = args.attn if args.attn != "auto" else ("flash" if mesh is None else "xla")
    if attn != model_cfg.model.attn_impl:
        import dataclasses

        from f5tts_tpu.models.cfm import CFMConfig

        model_cfg = CFMConfig(model=dataclasses.replace(model_cfg.model, attn_impl=attn))

    logger = lambda **kw: print(json.dumps(kw), flush=True)  # noqa: E731

    def build_sample_hook(first_batch):
        if not args.sample_every:
            return None
        import os

        from f5tts_tpu.train.sample_hook import make_sample_hook, prompts_from_batch

        vocoder = None
        if args.sample_vocoder:
            from f5tts_tpu.models.convert import load_params_npz
            from f5tts_tpu.models.vocos import VocosConfig

            vocoder = (load_params_npz(args.sample_vocoder), VocosConfig(input_channels=model_cfg.model.mel_dim))
        return make_sample_hook(
            model_cfg, os.path.join(args.checkpoint_dir, "samples"),
            prompts_from_batch(first_batch), nfe_step=args.sample_nfe,
            vocoder=vocoder, logger=logger,
        )

    trainer = Trainer(
        model_cfg, train_cfg, mesh=mesh,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        checkpoint_dir=args.checkpoint_dir, log_every=args.log_every, save_every=args.save_every,
        logger=logger, sample_every=args.sample_every or None,
    )
    state, start = trainer.init_or_resume()

    if args.smoke:
        from f5tts_tpu.train.data import synthetic_batches

        # batch rows must divide the data-mesh axis when a mesh is in play
        smoke_batch = max(2, jax.device_count()) if mesh is not None else 2
        batches = list(synthetic_batches(model_cfg.model, frames=256, batch=smoke_batch, n_batches=3, seed=args.seed))
        trainer.sample_hook = build_sample_hook(batches[0])
        trainer.log_every = 1
        state = trainer.fit(state, batches, total_updates=3)
        print(f"smoke ok: step={int(state['step'])}")
        return

    from f5tts_tpu.train.data import FramePackedDataset

    ds = FramePackedDataset.from_dir(args.dataset_dir, vocab_file=args.vocab_file)
    batches = ds.batches(
        batch_frames=args.batch_frames, max_samples=args.max_samples,
        seed=args.seed, skip_batches=start,
    )
    if args.sample_every:
        # peek the first batch for the fixed prompt set, then chain it back
        import itertools

        first = next(batches)
        trainer.sample_hook = build_sample_hook(first)
        batches = itertools.chain([first], batches)
    # batches() is an infinite epoch iterator — the update budget is the stop
    trainer.fit(state, batches, total_updates=max(args.total_updates - start, 0))


if __name__ == "__main__":
    main()
