"""Checkpoint conversion CLI: torch / trained-orbax -> native ``.npz``.

The torch converters (``models/convert.py``) run key mapping, transposes, and
weight-norm folding at every load; ``f5tpu-convert`` does that work once and
writes the framework's native inference format (flat ``.npz`` pytree), which
every loader (`--ckpt-file`, server ``tts_ckpt``/``vocoder_ckpt``) accepts
directly. Also exports EMA weights out of an orbax training run.

Examples:
    f5tpu-convert --ckpt model_1200000.safetensors --model F5TTS_Base \
        --vocab vocab.txt --out f5_base.npz
    f5tpu-convert --ckpt runs/ckpts --model F5TTS_Base --vocab vocab.txt \
        --out f5_trained.npz                       # orbax train dir (EMA)
    f5tpu-convert --vocoder-ckpt pytorch_model.bin --vocoder-out vocos.npz
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser("f5tpu-convert", description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", default="", help="torch .pt/.safetensors or orbax train dir")
    p.add_argument("--model", default="F5TTS_Base",
                   help="F5TTS_Base | F5TTS_Small | E2TTS_Base | E2TTS_Small")
    p.add_argument("--vocab", default="", help="vocab.txt (sets text_num_embeds)")
    p.add_argument("--out", default="", help="output .npz for the backbone")
    p.add_argument("--raw-weights", action="store_true",
                   help="orbax input: export raw params instead of EMA")
    p.add_argument("--vocoder-ckpt", default="", help="vocos torch checkpoint")
    p.add_argument("--vocoder-out", default="", help="output .npz for the vocoder")
    args = p.parse_args(argv)
    if not (args.ckpt or args.vocoder_ckpt):
        p.error("nothing to convert: pass --ckpt and/or --vocoder-ckpt")

    import os

    import numpy as np

    from f5tts_tpu.models.convert import save_params_npz

    if args.ckpt:
        if not args.out:
            p.error("--ckpt needs --out")
        if not args.vocab:
            p.error("--ckpt needs --vocab (vocab size fixes the text embedding)")
        from f5tts_tpu.text.tokenizer import Tokenizer

        vocab_size = Tokenizer.from_file(args.vocab).vocab_size
        if args.model.startswith("E2TTS"):
            from f5tts_tpu.models.unett import UNetTConfig

            base = UNetTConfig.small() if args.model == "E2TTS_Small" else UNetTConfig.base()
            cfg = UNetTConfig(**{**base.__dict__, "text_num_embeds": vocab_size})
            if os.path.isdir(args.ckpt):
                from f5tts_tpu.models.convert import load_trained_checkpoint

                params = load_trained_checkpoint(args.ckpt, cfg, use_ema=not args.raw_weights)
            else:
                from f5tts_tpu.models.convert import convert_e2_unett, load_torch_state_dict

                params = convert_e2_unett(load_torch_state_dict(args.ckpt), cfg)
        else:
            from f5tts_tpu.models.dit import DiTConfig

            base = DiTConfig.small() if args.model == "F5TTS_Small" else DiTConfig.base()
            cfg = DiTConfig(**{**base.__dict__, "text_num_embeds": vocab_size})
            if os.path.isdir(args.ckpt):
                from f5tts_tpu.models.convert import load_trained_checkpoint

                params = load_trained_checkpoint(args.ckpt, cfg, use_ema=not args.raw_weights)
            else:
                from f5tts_tpu.models.convert import convert_f5_dit, load_torch_state_dict

                params = convert_f5_dit(load_torch_state_dict(args.ckpt), cfg)
        save_params_npz(args.out, params)
        n = sum(int(np.asarray(x).size) for x in __import__("jax").tree.leaves(params))
        print(f"wrote {args.out}: {args.model} ({n / 1e6:.1f}M params)")

    if args.vocoder_ckpt:
        if not args.vocoder_out:
            p.error("--vocoder-ckpt needs --vocoder-out")
        from f5tts_tpu.models.convert import load_vocos_checkpoint

        save_params_npz(args.vocoder_out, load_vocos_checkpoint(args.vocoder_ckpt))
        print(f"wrote {args.vocoder_out}: vocos")


if __name__ == "__main__":
    main()
