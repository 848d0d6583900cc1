"""Model cores: DiT / UNetT / MMDiT backbones, CFM flow-matching wrapper, Vocos vocoder.

Models are plain parameter pytrees (nested dicts of ``jnp`` arrays) with pure
``apply`` functions — fully transparent to ``jax.jit`` / ``pjit`` sharding and
to the torch-checkpoint converters in ``f5tts_tpu.models.convert``.
"""

from f5tts_tpu.models.cfm import CFMConfig  # noqa: F401
from f5tts_tpu.models.dit import DiTConfig, dit_forward, init_dit  # noqa: F401


def backbone_fns(model_cfg):
    """``(init_fn, forward_fn)`` for a backbone config.

    All backbones share one apply signature
    ``forward(params, cfg, x, cond, text, time, drop_audio_cond, drop_text,
    mask=..., text_emb=..., compute_dtype=..., dropout_rng=...)`` so the CFM
    loss, sampler and trainer are backbone-generic (the reference's trainer
    takes any of CFM's transformers the same way, ``model/trainer.py:24``).
    """
    from f5tts_tpu.models.mmdit import MMDiTConfig, init_mmdit, mmdit_forward
    from f5tts_tpu.models.unett import UNetTConfig, init_unett, unett_forward

    if isinstance(model_cfg, DiTConfig):
        return init_dit, dit_forward
    if isinstance(model_cfg, UNetTConfig):
        return init_unett, unett_forward
    if isinstance(model_cfg, MMDiTConfig):
        return init_mmdit, mmdit_forward
    raise TypeError(f"unknown backbone config {type(model_cfg).__name__}")
