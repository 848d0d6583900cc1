"""ODE sampling: sway-warped time grids, fused-CFG Euler/midpoint solvers."""

from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm, sway_time_grid  # noqa: F401
