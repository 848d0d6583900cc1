"""f5tts_tpu — a TPU-native Indic TTS framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``dwani-ai/tts-indic-server-f5`` (FastAPI serving shim around IndicF5 / F5-TTS):

- text + reference-audio -> mel via conditional flow matching (Euler ODE with
  classifier-free guidance and sway-warped time grid) over a DiT backbone,
- mel -> waveform via a Vocos-class ISTFT-head vocoder,
- an OpenAI-style HTTP serving surface with continuous batching,
- a flow-matching trainer with frame-packed batching, EMA and resumable
  checkpoints,
all sharded over a ``jax.sharding.Mesh`` (data x model) rather than the
reference's single-GPU + Accelerate-DDP design.

See SURVEY.md at the repo root for the structural map of the reference and
file:line parity citations throughout this package.
"""

__version__ = "0.1.0"
