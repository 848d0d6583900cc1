"""Param/FLOP counter (parity with ``scripts/count_params_gflops.py``: F5-TTS
Base = 335.8M params / 363.4 GMACs per forward at 20 s audio + 150 text).

Uses shape-only init (no weights materialized) and analytic per-layer MAC
counts in the reference's convention (thop counts multiply-accumulates)."""

import argparse


def dit_flops(cfg, n_frames: int) -> float:
    """MACs per forward (batch 1), thop convention."""
    d, inner = cfg.dim, cfg.heads * cfg.dim_head
    tokens = n_frames
    per_block = (
        tokens * d * 6 * d  # adaln modulation
        + 4 * tokens * d * inner  # qkvo
        + 2 * tokens * tokens * cfg.dim_head * cfg.heads  # qk + av
        + 2 * tokens * d * d * cfg.ff_mult  # ff
    )
    text = cfg.conv_layers * tokens * (cfg.text_dim * 7 + 2 * cfg.text_dim * cfg.text_dim * 2)
    input_embed = tokens * (2 * cfg.mel_dim + cfg.text_dim) * d + 2 * tokens * d * (d // 16) * 31
    out = tokens * d * 2 * d + tokens * d * cfg.mel_dim
    return cfg.depth * per_block + text + input_embed + out


def main():
    import jax
    import numpy as np

    from f5tts_tpu.models.dit import DiTConfig, init_dit
    from f5tts_tpu.models.unett import UNetTConfig, init_unett
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos

    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--text-tokens", type=int, default=150)
    args = p.parse_args()
    frames = int(args.seconds * 24000 / 256)

    for name, init, cfg in [
        ("F5TTS_Base (DiT)", init_dit, DiTConfig.base()),
        ("F5TTS_Small (DiT)", init_dit, DiTConfig.small()),
        ("E2TTS_Base (UNetT)", init_unett, UNetTConfig.base()),
        ("Vocos", init_vocos, VocosConfig()),
    ]:
        shapes = jax.eval_shape(lambda k, c=cfg, f=init: f(k, c), jax.random.PRNGKey(0))
        n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
        line = f"{name}: {n/1e6:.1f}M params"
        if hasattr(cfg, "depth") and hasattr(cfg, "ff_mult") and name.startswith(("F5", "E2")) and "DiT" in name:
            line += f", {dit_flops(cfg, frames)/1e9:.1f} GMACs/fwd @ {args.seconds:.0f}s"
        print(line)


if __name__ == "__main__":
    main()
