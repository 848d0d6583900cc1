"""Continuous batcher: grouping, ordering, overload shedding."""

import time

import numpy as np
import pytest

import jax

from f5tts_tpu.engine.batcher import ContinuousBatcher, OverloadedError
from f5tts_tpu.engine.engine import EngineConfig, RowSpec, TTSEngine
from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.models.vocos import VocosConfig, init_vocos
from f5tts_tpu.ops.mel import MelConfig
from f5tts_tpu.sampling.euler import SamplerConfig
from f5tts_tpu.text.tokenizer import Tokenizer


def _engine():
    dit_cfg = DiTConfig(
        dim=48, depth=1, heads=2, dim_head=24, ff_mult=2, mel_dim=16,
        text_num_embeds=120, text_dim=24, conv_layers=1, max_pos=256,
    )
    voc_cfg = VocosConfig(input_channels=16, dim=32, intermediate_dim=64, num_layers=1)
    return TTSEngine(
        init_dit(jax.random.PRNGKey(0), dit_cfg), dit_cfg,
        init_vocos(jax.random.PRNGKey(1), voc_cfg),
        Tokenizer.from_texts(["batcher test text"]),
        EngineConfig(mel=MelConfig(n_mels=16), vocoder=voc_cfg, sampler=SamplerConfig(steps=1),
                     duration_buckets=(64,), batch_buckets=(1, 2, 4), text_pad=32, compute_dtype="float32"),
    )


def _row(engine, i):
    rng = np.random.default_rng(i)
    return RowSpec(text=f"row {i}", cond_mel=rng.standard_normal((8, 16)).astype(np.float32),
                   ref_frames=8, duration=48, steps=1, cfg_strength=1.0, seed=i)


def test_batcher_batches_and_preserves_results():
    engine = _engine()
    b = ContinuousBatcher(engine, max_batch=8, max_wait_ms=30).start()
    try:
        futures = [b.submit(_row(engine, i)) for i in range(5)]
        results = [f.result(timeout=300) for f in futures]
        assert all(r[0].ndim == 1 for r in results)
        assert b.stats["rows"] == 5
        assert b.stats["max_batch_seen"] >= 2
    finally:
        b.stop()


def test_batcher_overload_sheds():
    engine = _engine()
    b = ContinuousBatcher(engine, max_batch=2, max_wait_ms=5, max_queue=3)
    # not started: queue only fills
    futs = [b.submit(_row(engine, i)) for i in range(5)]
    shed = [f for f in futs if f.done() and isinstance(f.exception(), OverloadedError)]
    assert len(shed) == 2  # queue cap 3, two rejected
    b._jobs.clear()


def test_stop_fails_queued_futures():
    """stop() must resolve still-queued futures instead of abandoning them
    (waiters would otherwise block for their full result() timeout)."""
    import pytest

    from f5tts_tpu.engine.batcher import ContinuousBatcher, OverloadedError, _Job
    from f5tts_tpu.engine.engine import RowSpec

    b = ContinuousBatcher.__new__(ContinuousBatcher)
    import threading

    b._jobs = [_Job(row=None)]
    b._lock = threading.Lock()
    b._wake = threading.Event()
    b._stop = False
    b._thread = None
    orphan = b._jobs[0].future
    b.stop()
    with pytest.raises(OverloadedError):
        orphan.result(timeout=1)


def test_submit_after_stop_fails_fast():
    """A submit racing (or following) stop() must fail immediately instead of
    enqueueing onto a dead worker and pinning its waiter for the full
    result() timeout (serve unload snapshots the batcher ref, so this race
    is reachable from the request path)."""
    b = ContinuousBatcher(engine=None)  # never started: no engine touch
    b.stop()
    fut = b.submit(_row(None, 0))
    with pytest.raises(OverloadedError):
        fut.result(timeout=1)
    assert not b._jobs  # nothing left queued
