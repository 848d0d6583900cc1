"""Mesh construction and sharding rules (data x model) for DiT training/serving."""

from f5tts_tpu.parallel.mesh import build_mesh  # noqa: F401
from f5tts_tpu.parallel.sharding import dit_param_specs, shard_params  # noqa: F401
