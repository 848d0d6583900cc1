"""Periodic sample synthesis during training — a training-quality signal you
can hear (parity with the reference's ``log_samples`` path,
``model/trainer.py:341-366``: every ``save_per_updates`` it pulls the EMA
weights, runs ``CFM.sample`` on the last batch's reference, vocodes and writes
a wav next to the checkpoints).

TPU shape discipline: the prompt set is padded once to a fixed bucket and the
sampler is jitted once — every firing reuses the same compiled program.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.models import backbone_fns
from f5tts_tpu.models.cfm import CFMConfig
from f5tts_tpu.sampling.euler import SamplerConfig, nfe_to_steps, sample_cfm


def _sample_fns(model_cfg):
    """(forward_fn, embed_fn) for any backbone (sampler is backbone-generic)."""
    from f5tts_tpu.models.dit import DiTConfig, dit_embed, dit_forward
    from f5tts_tpu.models.mmdit import MMDiTConfig, mmdit_forward, mmdit_text_embed
    from f5tts_tpu.models.unett import UNetTConfig, unett_embed, unett_forward

    def mmdit_embed(params, cfg, text, n, drop_text, valid_mask=None):
        # MMDiT's text stream is token-aligned, not frame-aligned: n/valid_mask
        # don't apply (generic-embed signature adapter)
        return mmdit_text_embed(params, cfg, text, drop_text)

    return {
        DiTConfig: (dit_forward, dit_embed),
        UNetTConfig: (unett_forward, unett_embed),
        MMDiTConfig: (mmdit_forward, mmdit_embed),
    }[type(model_cfg)]


def prompts_from_batch(batch: dict, k: int = 2) -> list[dict]:
    """Fixed prompts from a training batch (the reference samples from its
    last batch's reference audio the same way): the first half of each row's
    mel is the conditioning, the model regenerates the second half against the
    row's full text."""
    prompts = []
    for i in range(min(k, batch["mel"].shape[0])):
        ln = int(batch["lens"][i])
        if ln < 8:
            continue
        prompts.append({
            "cond_mel": np.asarray(batch["mel"][i, : ln // 2], np.float32),
            "text": np.asarray(batch["text"][i], np.int32),
            "duration": ln,
        })
    return prompts


def make_sample_hook(
    model_cfg: CFMConfig,
    out_dir: str,
    prompts: list[dict],
    *,
    nfe_step: int = 16,
    method: str = "euler",
    cfg_strength: float = 2.0,
    vocoder=None,  # optional (vocos_params, VocosConfig): also write wavs
    logger=None,  # callable(**metrics): mel norms land in the training log
    compute_dtype=jnp.float32,
    use_ema: bool = True,
):
    """Returns ``hook(state, step)`` for ``Trainer(sample_hook=...)``.

    Writes ``{out_dir}/step{N}_p{i}.npy`` (generated mel) and — when a
    converted Vocos checkpoint is supplied — ``.wav`` at 24 kHz, and logs
    per-prompt generated-mel RMS (a cheap collapse/explosion detector).
    """
    if not prompts:
        raise ValueError("sample hook needs at least one prompt")
    forward_fn, embed_fn = _sample_fns(model_cfg.model)
    mel_dim = model_cfg.model.mel_dim
    # one fixed bucket for all prompts -> one compile for the training run
    bucket = max(int(p["duration"]) for p in prompts)
    bucket = int(np.ceil(bucket / 64) * 64)
    nt = max(len(p["text"]) for p in prompts)
    b = len(prompts)
    cond = np.zeros((b, bucket, mel_dim), np.float32)
    text = np.full((b, nt), -1, np.int32)
    lens = np.zeros((b,), np.int32)
    durs = np.zeros((b,), np.int32)
    for i, p in enumerate(prompts):
        f = min(len(p["cond_mel"]), bucket)
        cond[i, :f] = p["cond_mel"][:f]
        text[i, : len(p["text"])] = p["text"]
        lens[i] = f
        durs[i] = min(int(p["duration"]), bucket)
    sampler = SamplerConfig(steps=nfe_to_steps(nfe_step, method), method=method,
                            cfg_strength=cfg_strength)
    seeds = jnp.arange(b, dtype=jnp.int32)  # fixed noise: steps are comparable

    @jax.jit
    def synth(params):
        return sample_cfm(
            params, model_cfg.model, cond=jnp.asarray(cond), cond_lens=jnp.asarray(lens),
            text=jnp.asarray(text), duration=jnp.asarray(durs), sampler=sampler,
            seeds=seeds, compute_dtype=compute_dtype,
            forward_fn=forward_fn, embed_fn=embed_fn,
        )

    def hook(state, step: int):
        os.makedirs(out_dir, exist_ok=True)
        params = state["ema"] if use_ema else state["params"]
        mel = np.asarray(synth(params), np.float32)  # (b, bucket, mel)
        metrics = {}
        for i in range(b):
            gen = mel[i, lens[i] : durs[i]]
            np.save(os.path.join(out_dir, f"step{step}_p{i}.npy"), gen)
            metrics[f"sample_mel_rms_p{i}"] = float(np.sqrt(np.mean(np.square(gen))))
            if vocoder is not None:
                from f5tts_tpu.audio.io import write_wav
                from f5tts_tpu.models.vocos import vocos_decode

                vparams, vcfg = vocoder
                wave = np.asarray(vocos_decode(vparams, jnp.asarray(gen)[None], vcfg)[0], np.float32)
                write_wav(os.path.join(out_dir, f"step{step}_p{i}.wav"), wave, 24_000)
        if logger is not None:
            logger(step=step, **metrics)
        return metrics

    return hook
