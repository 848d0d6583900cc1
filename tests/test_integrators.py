"""Higher-order ODE integrators + NFE semantics (the certified serving default).

The serving default is Ralston RK2 at 10 intervals (NFE 20 per guidance
branch) — certified in BENCH.md by measuring each config's distance to a
fine-grid solve of the SAME guided ODE (same weights/noise/guidance as the
reference recipe, ``infer/utils_infer.py:49-52``; the recipe itself is
method='euler', steps=32). These tests pin (a) the integrators' convergence
to the same solution, (b) the NFE→intervals conversion, (c) the default
wiring through EngineConfig / Settings.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.sampling.euler import (
    DEFAULT_NFE,
    EVALS_PER_STEP,
    SamplerConfig,
    nfe_to_steps,
    sample_cfm,
    sample_noise_from_seeds,
    serving_default_sampler,
)

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
    text_num_embeds=30, text_dim=32, conv_layers=2, max_pos=256,
)


@pytest.fixture(scope="module")
def solve_setup():
    params = init_dit(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(3)
    b, n = 2, 64
    cond = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)) * 0.3 - 1.0, jnp.float32)
    lens = jnp.asarray([16, 20], jnp.int32)
    text = jnp.asarray(rng.integers(0, TINY.text_num_embeds, (b, 12)), jnp.int32)
    dur = jnp.asarray([56, 64], jnp.int32)
    y0 = sample_noise_from_seeds(jnp.asarray([5, 6], jnp.int32), n, TINY.mel_dim, dur)

    def solve(sampler):
        return np.asarray(
            sample_cfm(params, TINY, cond=cond, cond_lens=lens, text=text,
                       duration=dur, sampler=sampler, y0=y0),
            np.float32,
        )

    gen_mask = (np.arange(n)[None, :] >= np.asarray(lens)[:, None]) & (
        np.arange(n)[None, :] < np.asarray(dur)[:, None])
    return solve, gen_mask


def _err(a, b, mask):
    return float(np.sqrt(np.mean((a[mask] - b[mask]) ** 2)))


@pytest.mark.parametrize("method", [
    "midpoint",
    "ralston",
    pytest.param("heun", marks=pytest.mark.slow),
    pytest.param("rk4", marks=pytest.mark.slow),
])
def test_integrators_converge_to_the_euler_limit(solve_setup, method):
    """Every integrator solves the SAME guided ODE: at moderate step counts
    each lands near the fine-grid Euler solution, and refining the grid
    reduces the error (so the step loop is consistent, not just finite)."""
    solve, mask = solve_setup
    truth = solve(SamplerConfig(steps=256, cfg_strength=2.0))
    coarse = solve(SamplerConfig(steps=4, cfg_strength=2.0, method=method))
    fine = solve(SamplerConfig(steps=24, cfg_strength=2.0, method=method))
    e_coarse, e_fine = _err(coarse, truth, mask), _err(fine, truth, mask)
    scale = float(np.sqrt(np.mean(truth[mask] ** 2)))
    assert e_fine < e_coarse, (e_coarse, e_fine)
    assert e_fine < 0.1 * scale, (e_fine, scale)


def test_ralston_beats_euler_at_equal_evals_on_smooth_field(solve_setup):
    """The certification claim at its weakest useful form: against the
    fine-grid solution, ralston at 8 intervals (16 evals) is no worse than
    2x Euler at 16 steps (16 evals) even on this random-init field; BENCH.md
    records the toy-trained fields where it is strictly better than the
    full 32-step recipe."""
    solve, mask = solve_setup
    truth = solve(SamplerConfig(steps=256, cfg_strength=2.0))
    e_ral = _err(solve(SamplerConfig(steps=8, cfg_strength=2.0, method="ralston")), truth, mask)
    e_eul = _err(solve(SamplerConfig(steps=16, cfg_strength=2.0)), truth, mask)
    assert e_ral < 2.0 * e_eul, (e_ral, e_eul)


def test_cfg_null_reuse_runs_and_stays_close(solve_setup):
    solve, mask = solve_setup
    full = solve(SamplerConfig(steps=12, cfg_strength=2.0, method="midpoint"))
    reused = solve(SamplerConfig(steps=12, cfg_strength=2.0, method="midpoint", cfg_null_reuse=True))
    scale = float(np.sqrt(np.mean(full[mask] ** 2)))
    assert np.all(np.isfinite(reused))
    assert _err(reused, full, mask) < 0.5 * scale


def test_nfe_to_steps_counts_model_evals():
    assert nfe_to_steps(32, "euler") == 32
    assert nfe_to_steps(20, "ralston") == 10
    assert nfe_to_steps(20, "midpoint") == 10
    assert nfe_to_steps(20, "rk4") == 5
    assert nfe_to_steps(1, "rk4") == 1  # floor at one interval
    for m, e in EVALS_PER_STEP.items():
        assert nfe_to_steps(DEFAULT_NFE[m], m) * e == DEFAULT_NFE[m]


def test_serving_default_is_certified_ralston():
    from f5tts_tpu.sampling.euler import OPT_GRID_BASE_RALSTON8, default_time_grid

    s = serving_default_sampler()
    # the certified default: ralston@10 on the sway grid (NFE 20/branch; the
    # round-3 hard-field investigation kept this — BENCH.md)
    assert (s.method, s.steps, s.cfg_strength, s.sway_sampling_coef) == ("ralston", 10, 2.0, -1.0)
    assert s.time_grid is None

    from f5tts_tpu.engine.engine import EngineConfig

    assert EngineConfig().sampler == s
    # the exact reference recipe stays reachable
    assert serving_default_sampler(method="euler", steps=32).steps == 32
    assert serving_default_sampler(method="euler", steps=32).time_grid is None
    # the NFE-16 fast mode auto-resolves the base-optimized knot grid
    s8 = serving_default_sampler(steps=8)
    assert s8.time_grid == OPT_GRID_BASE_RALSTON8
    # recipe-grid resolution is (method, steps)-exact
    assert default_time_grid("ralston", 8) == OPT_GRID_BASE_RALSTON8
    assert default_time_grid("ralston", 10) is None
    assert default_time_grid("euler", 8) is None


def test_serving_default_rejects_mismatched_explicit_grid():
    """An explicit time_grid whose length doesn't match steps is a caller bug
    — silently swapping in the framework default would mask it."""
    import pytest

    with pytest.raises(ValueError, match="knots"):
        serving_default_sampler(steps=10, time_grid=(0.0, 0.5, 1.0))
    # matching explicit grids pass through untouched
    s = serving_default_sampler(steps=2, time_grid=(0.0, 0.5, 1.0))
    assert s.time_grid == (0.0, 0.5, 1.0)


def test_engine_request_nfe_is_evals(tmp_path):
    """A request's nfe_step counts evals/branch at ANY configured method."""
    from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos
    from f5tts_tpu.ops.mel import MelConfig
    from f5tts_tpu.text.tokenizer import Tokenizer

    tok = Tokenizer({" ": 0, "a": 1, "b": 2})
    cfg = EngineConfig(mel=MelConfig(n_mels=20),
                       vocoder=VocosConfig(input_channels=20, dim=32, intermediate_dim=64, num_layers=1),
                       compute_dtype="float32")
    dit_cfg = TINY
    eng = TTSEngine(init_dit(jax.random.PRNGKey(0), dit_cfg), dit_cfg,
                    init_vocos(jax.random.PRNGKey(1), cfg.vocoder), tok, cfg)
    wav = np.sin(np.linspace(0, 400, 24000 // 4)).astype(np.float32)
    plan_default = eng.prepare_request("ab ab", wav, 24000, "ab")
    assert plan_default.rows[0].steps == 10  # ralston default: NFE 20 -> 10 intervals
    plan_32 = eng.prepare_request("ab ab", wav, 24000, "ab", nfe_step=32)
    assert plan_32.rows[0].steps == 16  # 32 evals at 2 evals/interval


def test_request_sampler_inherits_every_knob():
    """Regression: _compiled once rebuilt SamplerConfig field-by-field and
    silently dropped cfg_cache_mode/cfg_null_reuse; the per-request sampler
    must inherit every configured knob except (steps, cfg_strength)."""
    from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos
    from f5tts_tpu.ops.mel import MelConfig
    from f5tts_tpu.text.tokenizer import Tokenizer

    base = SamplerConfig(method="euler", steps=32, cfg_cache_period=2,
                         cfg_cache_mode="extrapolate", sway_sampling_coef=-0.7)
    cfg = EngineConfig(mel=MelConfig(n_mels=20),
                       vocoder=VocosConfig(input_channels=20, dim=32, intermediate_dim=64, num_layers=1),
                       sampler=base, compute_dtype="float32")
    eng = TTSEngine(init_dit(jax.random.PRNGKey(0), TINY), TINY,
                    init_vocos(jax.random.PRNGKey(1), cfg.vocoder),
                    Tokenizer({" ": 0, "a": 1}), cfg)
    s = eng._request_sampler(16, 1.5)
    assert (s.steps, s.cfg_strength) == (16, 1.5)
    assert (s.method, s.cfg_cache_period, s.cfg_cache_mode, s.sway_sampling_coef) == (
        "euler", 2, "extrapolate", -0.7)


def test_settings_validate_ode_method():
    from f5tts_tpu.utils.config import Settings

    with pytest.raises(ValueError):
        Settings(ode_method="eulerr")
    with pytest.raises(ValueError):
        Settings(ode_method="midpoint", cfg_cache=4)  # euler-only knob
    assert Settings(ode_method="euler", cfg_cache=4).cfg_cache == 4


def test_sampler_config_validation():
    with pytest.raises(ValueError):
        SamplerConfig(method="rk5")
    with pytest.raises(ValueError):
        SamplerConfig(method="euler", cfg_null_reuse=True)
    with pytest.raises(ValueError):
        SamplerConfig(method="midpoint", cfg_null_reuse=True, cfg_interval=(0.0, 0.5))
    with pytest.raises(ValueError):
        SamplerConfig(method="midpoint", cfg_cache_period=2)


def test_knot_range_segmentation_matches_single_solve():
    """Segmented solving (knot_range + paste_back=False between segments) is
    bit-identical to one full solve — the mechanism that lets very long truth
    solves run as several short device programs (quality_harness)."""
    import numpy as np

    import jax.numpy as jnp

    from f5tts_tpu.models.dit import DiTConfig, init_dit
    from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm, sample_noise_from_seeds

    cfg = DiTConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                    text_num_embeds=20, text_dim=16, conv_layers=1, max_pos=128)
    params = init_dit(jax.random.PRNGKey(0), cfg)
    b, n = 2, 64
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((b, n, 8)), jnp.float32)
    lens = jnp.asarray([10, 14], jnp.int32)
    text = jnp.asarray(rng.integers(0, 20, (b, 16)), jnp.int32)
    dur = jnp.asarray([48, 64], jnp.int32)
    seeds = jnp.asarray([5, 6], jnp.int32)
    y0 = sample_noise_from_seeds(seeds, n, 8, jnp.clip(jnp.maximum(jnp.maximum(16, lens) + 1, dur), max=n))

    sampler = SamplerConfig(steps=6, method="euler", cfg_strength=2.0)
    kw = dict(cond=cond, cond_lens=lens, text=text, duration=dur, sampler=sampler)
    full = np.asarray(sample_cfm(params, cfg, y0=y0, **kw))

    y = y0
    for a, bk in ((0, 3), (3, 6)):
        y = sample_cfm(params, cfg, y0=jnp.asarray(np.asarray(y)), **kw,
                       knot_range=(a, bk), paste_back=(bk == 6))
    np.testing.assert_array_equal(full, np.asarray(y))

    with pytest.raises(ValueError, match="out of bounds"):
        sample_cfm(params, cfg, y0=y0, **kw, knot_range=(0, 7))
