"""Step-level continuous batching: composition invariance of mid-solve
join/leave (VERDICT round-3 item #1; SURVEY hard-part #4).

The contract under test: a row that joins a RUNNING solve group at a segment
boundary — while other rows are mid-trajectory — produces the same waveform
as its solo monolithic solve, to the same tolerance the window-batcher
co-batching tests use (per-row seeds + masks isolate rows)."""

import threading
import time

import numpy as np
import pytest

import jax

from f5tts_tpu.engine.batcher import OverloadedError
from f5tts_tpu.engine.engine import EngineConfig, RowSpec, TTSEngine
from f5tts_tpu.engine.step_batcher import SegmentPrograms, SolveGroup, StepBatcher, _Job
from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.models.vocos import VocosConfig, init_vocos
from f5tts_tpu.ops.mel import MelConfig
from f5tts_tpu.sampling.euler import SamplerConfig
from f5tts_tpu.text.tokenizer import Tokenizer


def _engine(method="ralston"):
    dit_cfg = DiTConfig(
        dim=48, depth=1, heads=2, dim_head=24, ff_mult=2, mel_dim=16,
        text_num_embeds=120, text_dim=24, conv_layers=1, max_pos=256,
    )
    voc_cfg = VocosConfig(input_channels=16, dim=32, intermediate_dim=64, num_layers=1)
    return TTSEngine(
        init_dit(jax.random.PRNGKey(0), dit_cfg), dit_cfg,
        init_vocos(jax.random.PRNGKey(1), voc_cfg),
        Tokenizer.from_texts(["step batcher test text"]),
        EngineConfig(mel=MelConfig(n_mels=16), vocoder=voc_cfg,
                     sampler=SamplerConfig(method=method, steps=2),
                     duration_buckets=(64,), batch_buckets=(1, 2, 4), text_pad=32,
                     compute_dtype="float32"),
    )


def _row(i, steps=2, cfg_strength=2.0):
    rng = np.random.default_rng(i)
    return RowSpec(text=f"step row {i}", cond_mel=rng.standard_normal((8, 16)).astype(np.float32),
                   ref_frames=8, duration=48, steps=steps, cfg_strength=cfg_strength, seed=i)


def test_segmented_group_matches_solo_rows():
    """Rows with DIFFERENT step counts and guidance strengths co-batched in
    one segmented group each equal their solo monolithic solve."""
    engine = _engine()
    rows = [_row(0, steps=2, cfg_strength=2.0), _row(1, steps=4, cfg_strength=1.5)]
    solo = [engine.synthesize_rows([r])[0] for r in rows]

    progs = SegmentPrograms(engine, segment_intervals=2)
    g = SolveGroup(progs, nb=64, bb=2)
    jobs = [_Job(r) for r in rows]
    for j in jobs:
        g.admit(j)
    while g.active():
        jax.block_until_ready(g.dispatch_segment())
        g.finalize_done()
    for j, (w_solo, m_solo) in zip(jobs, solo):
        w, m = j.future.result(timeout=1)
        np.testing.assert_allclose(w, w_solo, atol=1e-5)
        np.testing.assert_allclose(m, m_solo, atol=1e-5)


def test_mid_solve_join_matches_solo():
    """A row admitted into a slot freed MID-SOLVE (its neighbor still
    integrating its own knots) equals its solo solve — the composition-
    invariance bar for step-level continuous batching."""
    engine = _engine()
    progs = SegmentPrograms(engine, segment_intervals=1)
    long_row, short_row, joiner = _row(10, steps=4), _row(11, steps=1), _row(12, steps=2)
    solo = {id(r): engine.synthesize_rows([r])[0] for r in (long_row, short_row, joiner)}

    g = SolveGroup(progs, nb=64, bb=2)
    jobs = {id(r): _Job(r) for r in (long_row, short_row, joiner)}
    g.admit(jobs[id(long_row)])
    g.admit(jobs[id(short_row)])
    # segment 1: short row finishes and leaves; long row is mid-flight
    jax.block_until_ready(g.dispatch_segment())
    assert g.finalize_done() == 1
    assert g.active()  # long row still integrating
    # the joiner enters the freed slot at a segment boundary
    g.admit(jobs[id(joiner)])
    assert g.slots[g.slots.index(next(s for s in g.slots if s is not None and s.job is jobs[id(joiner)]))].joined_mid_solve
    while g.active():
        jax.block_until_ready(g.dispatch_segment())
        g.finalize_done()
    g.finalize_done()
    for r in (long_row, short_row, joiner):
        w, m = jobs[id(r)].future.result(timeout=1)
        w_solo, m_solo = solo[id(r)]
        np.testing.assert_allclose(w, w_solo, atol=1e-5)
        np.testing.assert_allclose(m, m_solo, atol=1e-5)


def test_edit_row_in_segmented_group():
    """Speech-edit rows (edit_mask infill) ride the segmented path too."""
    engine = _engine()
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(64 * 256 + 200).astype(np.float32) * 0.05
    edit_row, _rms = engine.prepare_edit_row(audio, 24000, "edited text", [(0.05, 0.15)], seed=7)
    solo_w, solo_m = engine.synthesize_rows([edit_row])[0]

    progs = SegmentPrograms(engine, segment_intervals=2)
    g = SolveGroup(progs, nb=64, bb=2)
    j_edit, j_plain = _Job(edit_row), _Job(_row(4))
    solo_plain = engine.synthesize_rows([_row(4)])[0]
    g.admit(j_edit)
    g.admit(j_plain)
    while g.active():
        jax.block_until_ready(g.dispatch_segment())
        g.finalize_done()
    w, m = j_edit.future.result(timeout=1)
    np.testing.assert_allclose(w, solo_w, atol=1e-5)
    np.testing.assert_allclose(m, solo_m, atol=1e-5)
    w2, _ = j_plain.future.result(timeout=1)
    np.testing.assert_allclose(w2, solo_plain[0], atol=1e-5)


def test_step_batcher_end_to_end_threads():
    engine = _engine()
    b = StepBatcher(engine, segment_intervals=1).start()
    try:
        rows = [_row(i, steps=2) for i in range(5)]
        solo = [engine.synthesize_rows([r])[0] for r in rows]
        futures = [b.submit(r) for r in rows]
        results = [f.result(timeout=300) for f in futures]
        for (w, m), (w_solo, m_solo) in zip(results, solo):
            np.testing.assert_allclose(w, w_solo, atol=1e-5)
        assert b.stats["rows"] == 5
        assert b.stats["segments"] >= 2
    finally:
        b.stop()


def test_step_batcher_late_arrival_joins_running_group():
    """A request submitted WHILE a long solve is running resolves without
    waiting for the long row to finish (the head-of-line-blocking fix)."""
    engine = _engine()
    b = StepBatcher(engine, segment_intervals=1).start()
    try:
        long_fut = b.submit(_row(20, steps=32))  # long trajectory
        time.sleep(0.3)  # let the long solve start
        late = _row(21, steps=1)
        solo = engine.synthesize_rows([late])[0]
        t0 = time.monotonic()
        late_fut = b.submit(late)
        w, m = late_fut.result(timeout=300)
        late_wall = time.monotonic() - t0
        np.testing.assert_allclose(w, solo[0], atol=1e-5)
        assert not long_fut.done() or late_wall < 60  # resolved independently
        long_fut.result(timeout=300)
    finally:
        b.stop()


def test_step_batcher_rejects_cached_guidance_sampler():
    engine = _engine()
    import dataclasses

    engine.cfg = dataclasses.replace(
        engine.cfg, sampler=SamplerConfig(method="euler", steps=4, cfg_cache_period=2))
    with pytest.raises(ValueError, match="window batcher"):
        StepBatcher(engine)


def test_step_batcher_stop_fails_queued():
    b = StepBatcher.__new__(StepBatcher)
    b._jobs = [_Job(row=None)]
    b._groups = []
    b._lock = threading.Lock()
    b._wake = threading.Event()
    b._stop = False
    b._thread = None
    orphan = b._jobs[0].future
    b.stop()
    with pytest.raises(OverloadedError):
        orphan.result(timeout=1)


def test_step_batcher_overload_sheds():
    engine = _engine()
    b = StepBatcher(engine, max_queue=3)  # not started: queue only fills
    futs = [b.submit(_row(i)) for i in range(5)]
    shed = [f for f in futs if f.done() and isinstance(f.exception(), OverloadedError)]
    assert len(shed) == 2
    b._jobs.clear()


def _engine_interval():
    """Engine configured with a guidance INTERVAL (cfg_interval) — round-5
    extension: these samplers now ride the step path (the gate becomes
    per-row data in solve_segment; cfg_cache/null_reuse stay window-only)."""
    dit_cfg = DiTConfig(
        dim=48, depth=1, heads=2, dim_head=24, ff_mult=2, mel_dim=16,
        text_num_embeds=120, text_dim=24, conv_layers=1, max_pos=256,
    )
    voc_cfg = VocosConfig(input_channels=16, dim=32, intermediate_dim=64, num_layers=1)
    return TTSEngine(
        init_dit(jax.random.PRNGKey(0), dit_cfg), dit_cfg,
        init_vocos(jax.random.PRNGKey(1), voc_cfg),
        Tokenizer.from_texts(["step batcher test text"]),
        EngineConfig(mel=MelConfig(n_mels=16), vocoder=voc_cfg,
                     sampler=SamplerConfig(method="euler", steps=4,
                                           cfg_interval=(0.3, 0.8)),
                     duration_buckets=(64,), batch_buckets=(1, 2, 4), text_pad=32,
                     compute_dtype="float32"),
    )


def test_segmented_cfg_interval_matches_monolithic():
    """Guidance-interval rows solved segment-by-segment equal the window
    path's host-partitioned guided/unguided runs (same gate: lo <= t0 < hi
    on each step's start knot), including rows at different step counts."""
    engine = _engine_interval()
    rows = [_row(20, steps=4, cfg_strength=2.0), _row(21, steps=6, cfg_strength=1.5)]
    solo = [engine.synthesize_rows([r])[0] for r in rows]

    progs = SegmentPrograms(engine, segment_intervals=1)
    g = SolveGroup(progs, nb=64, bb=2)
    jobs = [_Job(r) for r in rows]
    for j in jobs:
        g.admit(j)
    while g.active():
        jax.block_until_ready(g.dispatch_segment())
        g.finalize_done()
    for j, (w_solo, m_solo) in zip(jobs, solo):
        w, m = j.future.result(timeout=1)
        np.testing.assert_allclose(w, w_solo, atol=1e-5)
        np.testing.assert_allclose(m, m_solo, atol=1e-5)


def test_adaptive_chaining_low_load():
    """batcher=auto policy: a sole request's solve chains its segments
    without per-segment host ticks, and the result is unchanged."""
    engine = _engine()
    b = StepBatcher(engine, segment_intervals=1, adaptive=True).start()
    try:
        r = _row(30, steps=4)
        solo = engine.synthesize_rows([r])[0]
        w, m = b.submit(r).result(timeout=300)
        np.testing.assert_allclose(w, solo[0], atol=1e-5)
        assert b.stats.get("chained_segments", 0) >= 1
    finally:
        b.stop()


def test_settings_auto_batcher():
    from f5tts_tpu.utils.config import Settings

    assert Settings().batcher == "auto"
    with pytest.raises(ValueError, match="cfg_cache"):
        Settings(batcher="step", cfg_cache=4)
    # auto + cfg_cache is allowed at Settings level (server falls back to window)
    Settings(batcher="auto", cfg_cache=4)
