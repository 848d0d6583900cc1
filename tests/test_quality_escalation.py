"""Per-request quality escalation (VERDICT round-3 #3): the embedded RK2
error estimate and the quality=strict auto-escalation to the exact reference
recipe."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from f5tts_tpu.engine.engine import EngineConfig, RowSpec, TTSEngine
from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.models.vocos import VocosConfig, init_vocos
from f5tts_tpu.ops.mel import MelConfig
from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm, sample_noise_from_seeds
from f5tts_tpu.text.tokenizer import Tokenizer

DIT = DiTConfig(dim=48, depth=1, heads=2, dim_head=24, ff_mult=2, mel_dim=16,
                text_num_embeds=120, text_dim=24, conv_layers=1, max_pos=256)


def _engine(sampler=None, threshold=0.12):
    voc_cfg = VocosConfig(input_channels=16, dim=32, intermediate_dim=64, num_layers=1)
    return TTSEngine(
        init_dit(jax.random.PRNGKey(0), DIT), DIT,
        init_vocos(jax.random.PRNGKey(1), voc_cfg),
        Tokenizer.from_texts(["escalation test text"]),
        EngineConfig(mel=MelConfig(n_mels=16), vocoder=voc_cfg,
                     sampler=sampler or SamplerConfig(method="ralston", steps=2),
                     duration_buckets=(64,), batch_buckets=(1, 2, 4), text_pad=32,
                     compute_dtype="float32", strict_threshold=threshold),
    )


def _row(i, steps=2, quality="default"):
    rng = np.random.default_rng(i)
    return RowSpec(text=f"esc row {i}", cond_mel=rng.standard_normal((8, 16)).astype(np.float32),
                   ref_frames=8, duration=48, steps=steps, cfg_strength=2.0, seed=i,
                   quality=quality)


def _solve_inputs(b=2, n=64, nt=8):
    rng = np.random.default_rng(0)
    cond = np.zeros((b, n, DIT.mel_dim), np.float32)
    cond[:, :12] = rng.standard_normal((b, 12, DIT.mel_dim)) * 0.5
    lens = np.full((b,), 12, np.int32)
    text = rng.integers(0, DIT.text_num_embeds, (b, nt)).astype(np.int32)
    dur = np.asarray([48, 56], np.int32)
    seeds = np.arange(100, 100 + b, dtype=np.int32)
    return (jnp.asarray(cond), jnp.asarray(lens), jnp.asarray(text),
            jnp.asarray(dur), jnp.asarray(seeds))


def test_embedded_estimate_tracks_solver_error():
    """The estimate must order integration accuracy correctly: a coarser RK2
    solve has BOTH a larger true error (vs a fine solve) and a larger
    embedded estimate — and the estimate's scale is within a small factor of
    the true error (it's a local-truncation proxy for the same quantity)."""
    params = init_dit(jax.random.PRNGKey(0), DIT)
    cond, lens, text, dur, seeds = _solve_inputs()
    y0 = sample_noise_from_seeds(seeds, 64, DIT.mel_dim, dur)

    def solve(sampler, estimate=False):
        return sample_cfm(params, DIT, cond=cond, cond_lens=lens, text=text,
                          duration=dur, sampler=sampler, y0=y0,
                          return_error_estimate=estimate)

    truth = np.asarray(solve(SamplerConfig(method="euler", steps=128)))
    coarse, est_c = solve(SamplerConfig(method="ralston", steps=2), estimate=True)
    fine, est_f = solve(SamplerConfig(method="ralston", steps=10), estimate=True)

    gen = (np.arange(64)[None, :] >= 12) & (np.arange(64)[None, :] < np.asarray(dur)[:, None])

    def err(x):
        d = (np.asarray(x) - truth) ** 2 * gen[..., None]
        return np.sqrt(d.sum(axis=(1, 2)) / (gen.sum(axis=1) * DIT.mel_dim))

    err_c, err_f = err(coarse), err(fine)
    est_c, est_f = np.asarray(est_c), np.asarray(est_f)
    assert (err_c > err_f).all()
    assert (est_c > est_f).all()
    # scale sanity: the estimate is the same order of magnitude as the error
    for e_hat, e in [(est_c, err_c), (est_f, err_f)]:
        ratio = e_hat / np.maximum(e, 1e-9)
        assert (ratio > 0.1).all() and (ratio < 10.0).all(), ratio


def test_estimate_requires_two_stage_method():
    params = init_dit(jax.random.PRNGKey(0), DIT)
    cond, lens, text, dur, seeds = _solve_inputs()
    with pytest.raises(ValueError, match="2-stage"):
        sample_cfm(params, DIT, cond=cond, cond_lens=lens, text=text, duration=dur,
                   sampler=SamplerConfig(method="euler", steps=4), seeds=seeds,
                   return_error_estimate=True)


def test_strict_escalates_to_exact_recipe():
    """threshold below any estimate -> the strict row re-solves with the
    exact reference recipe; the result equals a euler-32 engine's output for
    the same request, and the default-quality row is untouched."""
    engine = _engine(threshold=0.0)
    recipe_engine = _engine(sampler=SamplerConfig(method="euler", steps=32))

    strict = _row(1, quality="strict")
    default = _row(2, quality="default")
    out = engine.synthesize_rows([strict, default])
    assert engine.escalations == 1
    assert engine.last_estimates[0] > 0.0

    recipe_out = recipe_engine.synthesize_rows([_row(1, steps=32)])[0]
    np.testing.assert_allclose(out[0][0], recipe_out[0], atol=1e-6)
    np.testing.assert_allclose(out[0][1], recipe_out[1], atol=1e-6)

    # the default row kept its (cheap) RK2 result
    plain = _engine().synthesize_rows([_row(2)])[0]
    np.testing.assert_allclose(out[1][0], plain[0], atol=1e-6)


def test_strict_below_threshold_keeps_default_result():
    engine = _engine(threshold=1e9)
    out = engine.synthesize_rows([_row(3, quality="strict")])
    assert engine.escalations == 0
    plain = _engine().synthesize_rows([_row(3)])[0]
    # same integrator, but the estimating program is a distinct XLA
    # compilation of the same arithmetic — co-batching tolerance applies
    np.testing.assert_allclose(out[0][0], plain[0], atol=1e-5)


def test_strict_noop_for_euler_recipe_engine():
    """With the exact recipe configured there is nothing to escalate TO;
    strict must be a harmless no-op, not an error."""
    engine = _engine(sampler=SamplerConfig(method="euler", steps=4), threshold=0.0)
    out = engine.synthesize_rows([_row(4, quality="strict")])
    assert engine.escalations == 0
    assert out[0][0].ndim == 1


def test_step_batcher_routes_strict_rows():
    from f5tts_tpu.engine.step_batcher import StepBatcher

    engine = _engine(threshold=0.0)
    solo = engine.synthesize_rows([_row(5, quality="strict")])[0]
    assert engine.escalations == 1
    b = StepBatcher(engine, segment_intervals=1).start()
    try:
        w, m = b.submit(_row(5, quality="strict")).result(timeout=300)
        np.testing.assert_allclose(w, solo[0], atol=1e-6)
        assert engine.escalations == 2
    finally:
        b.stop()
