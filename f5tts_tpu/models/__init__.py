"""Model cores: DiT / UNetT / MMDiT backbones, CFM flow-matching wrapper, Vocos vocoder.

Models are plain parameter pytrees (nested dicts of ``jnp`` arrays) with pure
``apply`` functions — fully transparent to ``jax.jit`` / ``pjit`` sharding and
to the torch-checkpoint converters in ``f5tts_tpu.models.convert``.
"""

from f5tts_tpu.models.cfm import CFMConfig  # noqa: F401
from f5tts_tpu.models.dit import DiTConfig, dit_forward, init_dit  # noqa: F401
