import os

# Tests run on a virtual 8-device CPU mesh (the standard JAX fake-backend idiom
# for exercising pjit/shard_map without TPU hardware). The environment pins
# JAX_PLATFORMS=axon (the TPU tunnel) and pre-imports jax via sitecustomize, so
# env vars alone are unreliable — set the config explicitly as well.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
# This jaxlib's default matmul precision is bf16-grade even on CPU; parity
# goldens need real fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache for the suite: the wall time is dominated by ~150
# XLA CPU compiles; with a warm cache repeat runs drop to execution time.
# Separate dir from the TPU cache (different backend artifacts).
from f5tts_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"))
