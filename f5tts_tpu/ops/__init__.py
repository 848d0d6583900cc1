"""Numerical ops: mel front-end, STFT/iSTFT, RoPE, masks, attention dispatch.

Pure JAX/XLA implementations live here; Pallas TPU kernels for the hot paths
live under ``f5tts_tpu.ops.pallas`` and are swapped in via dispatch flags.
"""
