"""Step distillation (train/distill.py): mechanics + the distillation claim
at micro scale — the student's few-step rollout moves TOWARD the teacher's
fine guided solve (the capability VERDICT round-3 item #2 asks for; full
certification runs on chip via scripts/distill_certify.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm, sample_noise_from_seeds
from f5tts_tpu.train.distill import DistillConfig, distill, make_distill_step, student_sampler

CFG = DiTConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                text_num_embeds=16, text_dim=16, conv_layers=1, max_pos=64)
N, REF = 32, 8


def _prompts(rng: np.random.Generator, batch=2):
    cond = np.zeros((batch, N, CFG.mel_dim), np.float32)
    cond[:, :REF] = rng.standard_normal((batch, REF, CFG.mel_dim)) * 0.5
    return {
        "cond": cond,
        "cond_lens": np.full((batch,), REF, np.int32),
        "text": rng.integers(0, CFG.text_num_embeds, (batch, 6)).astype(np.int32),
        "duration": rng.integers(24, N + 1, (batch,)).astype(np.int32),
        "seeds": rng.integers(0, 1 << 30, (batch,)).astype(np.int32),
    }


@pytest.fixture(scope="module")
def teacher():
    return init_dit(jax.random.PRNGKey(0), CFG)


def _err_to_fine(params, sampler, teacher, prompts):
    """mel L2 between a solve under ``sampler``/``params`` and the teacher's
    fine (64-step euler) guided solve on the same prompts + noise."""
    kw = dict(cond=jnp.asarray(prompts["cond"]),
              cond_lens=jnp.asarray(prompts["cond_lens"]),
              text=jnp.asarray(prompts["text"]),
              duration=jnp.asarray(prompts["duration"]))
    y0 = sample_noise_from_seeds(jnp.asarray(prompts["seeds"]), N, CFG.mel_dim,
                                 jnp.asarray(prompts["duration"]), jnp.float32)
    fine = sample_cfm(teacher, CFG, sampler=SamplerConfig(steps=64, cfg_strength=2.0),
                      y0=y0, **kw)
    got = sample_cfm(params, CFG, sampler=sampler, y0=y0, **kw)
    d = np.asarray(fine) - np.asarray(got)
    mask = ((np.arange(N)[None, :] >= prompts["cond_lens"][:, None])
            & (np.arange(N)[None, :] < prompts["duration"][:, None]))
    return float(np.sqrt(np.mean(np.square(d[mask]))))


def test_distill_step_runs_and_loss_decreases(teacher):
    dcfg = DistillConfig(student_steps=4, substeps=4, learning_rate=3e-4)
    _, step = make_distill_step(CFG, dcfg)
    jstep = jax.jit(step)
    import optax

    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
    student = jax.tree.map(lambda x: x, teacher)
    opt_state = opt.init(student)
    rng = np.random.default_rng(0)
    losses = []
    batch = {k: jnp.asarray(v) for k, v in _prompts(rng).items()}
    for _ in range(8):
        student, opt_state, m = jstep(student, opt_state, teacher, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # on a FIXED batch the loss must drop (optimization sanity)
    assert losses[-1] < losses[0]


def test_distilled_student_learns_the_guided_map(teacher):
    """After a short distillation run on HELD-OUT prompts, the student's
    K-step no-CFG rollout is much closer to the teacher's fine GUIDED solve
    than at init (where the student rollout is the unguided euler@K — wrong
    field entirely). The stronger claim — beating the teacher's own guided
    euler@K at half the forwards — needs a trained field and longer runs;
    it is validated at tiny geometry by scripts/distill_certify.py (the
    committed DISTILL artifacts), not at this micro scale."""
    dcfg = DistillConfig(student_steps=4, substeps=4, learning_rate=3e-4,
                         lr_decay_steps=40, seed=3)
    student = distill(teacher, CFG, dcfg, _prompts, steps=40, logger=None)

    eval_prompts = _prompts(np.random.default_rng(999))
    err_student = _err_to_fine(student, student_sampler(dcfg), teacher, eval_prompts)
    err_init = _err_to_fine(teacher, student_sampler(dcfg), teacher, eval_prompts)
    assert np.isfinite(err_student)
    assert err_student < 0.8 * err_init, (err_student, err_init)


def test_student_sampler_shape():
    dcfg = DistillConfig(student_steps=8)
    s = student_sampler(dcfg)
    assert s.cfg_strength == 0.0 and s.steps == 8
    assert len(s.time_grid) == 9
    assert s.time_grid[0] == 0.0 and s.time_grid[-1] == 1.0


def test_engine_serves_student_sampler(teacher):
    """A distilled student serves through the standard engine: SamplerConfig
    from student_sampler (euler on the student grid, guidance OFF — baked
    into the weights) drives the single-branch solve path end-to-end."""
    from f5tts_tpu.engine.engine import EngineConfig, RowSpec, TTSEngine
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos
    from f5tts_tpu.ops.mel import MelConfig
    from f5tts_tpu.text.tokenizer import Tokenizer

    dcfg = DistillConfig(student_steps=4)
    voc = VocosConfig(input_channels=CFG.mel_dim, dim=24, intermediate_dim=48, num_layers=1)
    eng = TTSEngine(
        teacher, CFG, init_vocos(jax.random.PRNGKey(1), voc),
        Tokenizer.from_texts(["student serving test"]),
        EngineConfig(mel=MelConfig(n_mels=CFG.mel_dim), vocoder=voc,
                     sampler=student_sampler(dcfg),
                     duration_buckets=(N,), batch_buckets=(1, 2), text_pad=16,
                     compute_dtype="float32"),
    )
    rng = np.random.default_rng(0)
    rows = [RowSpec(text="student serving test", cond_mel=rng.standard_normal((REF, CFG.mel_dim)).astype(np.float32),
                    ref_frames=REF, duration=N - 4, steps=dcfg.student_steps,
                    cfg_strength=0.0, seed=5)]
    (wave, mel), = eng.synthesize_rows(rows)
    assert np.isfinite(wave).all() and np.isfinite(mel).all()
    assert mel.shape[0] == N - 4 - REF


def test_loss_chunk_grads_match_single_shot(teacher):
    """Knot-chunked gradient accumulation (the HBM-bounded K-fold loss) is
    mathematically identical to the single-shot loss for uniform weighting:
    same loss, same update."""
    rng = np.random.default_rng(3)
    batch = {k: jnp.asarray(v) for k, v in _prompts(rng).items()}

    outs = {}
    for kc in (0, 2):
        dcfg = DistillConfig(student_steps=4, substeps=2, loss_chunk=kc)
        optimizer, step = make_distill_step(CFG, dcfg)
        student = jax.tree.map(jnp.copy, teacher)
        opt_state = optimizer.init(student)
        student, _, metrics = jax.jit(step)(student, opt_state, teacher, batch)
        outs[kc] = (float(metrics["loss"]), student)

    assert np.isclose(outs[0][0], outs[2][0], rtol=1e-5)
    flat0 = jax.tree.leaves(outs[0][1])
    flat2 = jax.tree.leaves(outs[2][1])
    for a, b in zip(flat0, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
