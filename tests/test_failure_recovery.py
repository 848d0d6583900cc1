"""Failure injection matrix (SURVEY §5 "failure detection/recovery: none" is
the axis this framework must beat; VERDICT round-3 #6):

- consecutive synthesis failures -> one auto model reload
- batcher worker killed mid-batch -> waiters resolve, submits fail fast
- NaN solve under co-batched traffic -> only the faulty request 500s
- checkpoint restore / hot-swap while serving -> no hangs, clean statuses
- crash mid-checkpoint-write -> resume falls back to the last good step
"""

import threading
import time

import numpy as np
import pytest
from aiohttp import web

from f5tts_tpu.serve.schemas import SpeechRequest
from f5tts_tpu.serve.server import ModelService
from f5tts_tpu.utils.config import Settings


def test_auto_reload_after_consecutive_failures():
    # injection point is engine.synthesize_rows — the WINDOW batcher's solve
    # call (the step/auto path never calls it; its injection twin is
    # test_step_path_failure_counts_and_reloads below)
    service = ModelService(Settings(demo_tiny=True, warmup=False, batcher="window"))
    service.load()
    assert service.loaded

    class Boom(Exception):
        pass

    def broken(*a, **kw):
        raise Boom("device lost")

    service.engine.synthesize_rows = broken
    req = SpeechRequest(text="hello there.")

    for expected in (1, 2):
        with pytest.raises(web.HTTPInternalServerError):
            service.synthesize_sync(req)

    # second consecutive failure kicks off a background reload
    deadline = time.time() + 120
    while time.time() < deadline and service.reloads == 0:
        time.sleep(0.2)
    assert service.reloads == 1
    assert service.failures == 0
    assert service.loaded
    # reloaded engine is a fresh object (the monkeypatched one is gone)
    assert service.engine.synthesize_rows is not broken
    service.unload()


def test_window_batcher_worker_death_fails_waiters():
    """A BaseException that kills the worker thread mid-batch (beyond the
    per-batch Exception handler) must resolve queued futures and make later
    submits fail fast — never pin waiters for their full result() timeout."""
    from f5tts_tpu.engine.batcher import ContinuousBatcher, OverloadedError
    from f5tts_tpu.engine.engine import RowSpec

    class _Eng:
        def synthesize_rows(self, rows):
            raise SystemExit("simulated worker death")

    b = ContinuousBatcher(_Eng(), max_wait_ms=1).start()
    row = RowSpec(text="x", cond_mel=np.zeros((4, 16), np.float32),
                  ref_frames=4, duration=16, steps=1)
    fut = b.submit(row)
    with pytest.raises(OverloadedError, match="died"):
        fut.result(timeout=30)
    # the dead batcher refuses new work instead of queueing into the void
    fut2 = b.submit(row)
    with pytest.raises(OverloadedError):
        fut2.result(timeout=5)


def test_step_batcher_worker_death_fails_waiters():
    from f5tts_tpu.engine.batcher import OverloadedError
    from f5tts_tpu.engine.engine import RowSpec
    from f5tts_tpu.engine.step_batcher import StepBatcher

    b = StepBatcher.__new__(StepBatcher)
    b._jobs = []
    b._groups = []
    b._lock = threading.Lock()
    b._wake = threading.Event()
    b._stop = False
    b._thread = None
    b._strict_pool = None
    b.max_queue = 16
    b.stats = {}
    b._admit_queued = lambda: (_ for _ in ()).throw(SystemExit("simulated death"))
    b.start()
    row = RowSpec(text="x", cond_mel=np.zeros((4, 16), np.float32),
                  ref_frames=4, duration=16, steps=1)
    fut = b.submit(row)
    with pytest.raises(OverloadedError, match="died"):
        fut.result(timeout=30)
    fut2 = b.submit(row)
    with pytest.raises(OverloadedError):
        fut2.result(timeout=5)


def test_nan_solve_fails_only_faulty_request_under_cobatch():
    """A poisoned (NaN) solve 500s its own request and counts toward
    auto-reload; a clean request sharing the batcher keeps working.
    (window path — the step-path twin is
    test_step_path_nan_fails_only_poisoned_request)"""
    service = ModelService(Settings(demo_tiny=True, warmup=False, batcher="window"))
    service.load()
    engine = service.engine
    orig = engine.synthesize_rows

    def poisoned(rows):
        out = orig(rows)
        return [((np.full_like(w, np.nan), m) if "poison" in r.text else (w, m))
                for r, (w, m) in zip(rows, out)]

    engine.synthesize_rows = poisoned
    results = {}

    def fire(tag, text):
        try:
            results[tag] = ("ok", service.synthesize_sync(SpeechRequest(text=text, nfe_step=2)))
        except web.HTTPException as e:
            results[tag] = ("http", e.status)

    ts = [threading.Thread(target=fire, args=("bad", "poison this one.")),
          threading.Thread(target=fire, args=("good", "a clean sentence."))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert results["bad"] == ("http", 500)
    assert results["good"][0] == "ok" and results["good"][1][:4] == b"RIFF"
    service.unload()


def test_step_path_nan_fails_only_poisoned_request():
    """Step/auto batcher twin of the NaN co-batch test: poison ONE row's
    trajectory inside the jitted segment program (keyed on a distinctive
    per-request cfg_strength — per-row data on the step path) — the poisoned
    request 500s and counts toward auto-reload, its co-batched neighbor
    succeeds."""
    import jax.numpy as jnp

    import f5tts_tpu.engine.step_batcher as sb

    service = ModelService(Settings(demo_tiny=True, warmup=False, batcher="step"))
    service.load()
    orig_seg = sb.solve_segment

    def poisoned_seg(*a, **kw):
        y = orig_seg(*a, **kw)
        match = kw["cfg_strength"] == 7.77
        return jnp.where(match[:, None, None], jnp.nan, y)

    sb.solve_segment = poisoned_seg
    results = {}

    def fire(tag, text, cfg_strength):
        try:
            results[tag] = ("ok", service.synthesize_sync(
                SpeechRequest(text=text, nfe_step=2, cfg_strength=cfg_strength)))
        except web.HTTPException as e:
            results[tag] = ("http", e.status)

    try:
        ts = [threading.Thread(target=fire, args=("bad", "poison this one.", 7.77)),
              threading.Thread(target=fire, args=("good", "a clean sentence.", 2.0))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
    finally:
        sb.solve_segment = orig_seg
    assert results["bad"] == ("http", 500)
    assert results["good"][0] == "ok" and results["good"][1][:4] == b"RIFF"
    # (no failure-counter assertion: the clean request legitimately resets
    # the CONSECUTIVE counter — reload-on-failures is covered by
    # test_step_path_failure_counts_and_reloads)
    service.unload()


def test_step_path_failure_counts_and_reloads():
    """Step/auto batcher twin of the consecutive-failure reload test: a
    device fault inside the segment program fails the request with a clean
    500 and two consecutive failures trigger one background reload."""
    import f5tts_tpu.engine.step_batcher as sb

    service = ModelService(Settings(demo_tiny=True, warmup=False, batcher="step"))
    service.load()

    class Boom(Exception):
        pass

    orig_seg = sb.solve_segment

    def broken_seg(*a, **kw):
        raise Boom("device lost")

    sb.solve_segment = broken_seg
    try:
        req = SpeechRequest(text="hello there.", nfe_step=2)
        for _ in (1, 2):
            with pytest.raises(web.HTTPInternalServerError):
                service.synthesize_sync(req)
        deadline = time.time() + 120
        while time.time() < deadline and service.reloads == 0:
            time.sleep(0.2)
    finally:
        sb.solve_segment = orig_seg
    assert service.reloads == 1
    assert service.loaded
    # the reloaded service (fresh batcher, unpatched solver) serves again
    body = service.synthesize_sync(SpeechRequest(text="after the reload.", nfe_step=2))
    assert body[:4] == b"RIFF"
    service.unload()


def test_checkpoint_restore_while_serving_is_clean():
    """A hot-swap (unload+load — the restore-while-live path) racing live
    traffic: every request either succeeds or fails with a clean HTTP status
    (503/500), nothing hangs, and traffic succeeds after the swap."""
    service = ModelService(Settings(demo_tiny=True, warmup=False))
    service.load()
    stop = threading.Event()
    outcomes = []

    def traffic():
        while not stop.is_set():
            try:
                body = service.synthesize_sync(SpeechRequest(text="live traffic.", nfe_step=2))
                outcomes.append(("ok", body[:4]))
            except web.HTTPException as e:
                outcomes.append(("http", e.status))
            time.sleep(0.01)

    threads = [threading.Thread(target=traffic) for _ in range(2)]
    for t in threads:
        t.start()
    time.sleep(1.0)
    service.unload()
    service.load()  # the restore-while-live moment
    time.sleep(1.0)
    stop.set()
    for t in threads:
        t.join(timeout=300)
    assert outcomes, "no traffic recorded"
    for kind, v in outcomes:
        if kind == "ok":
            assert v == b"RIFF"
        else:
            assert v in (500, 503)
    # post-swap requests succeed
    body = service.synthesize_sync(SpeechRequest(text="after the swap.", nfe_step=2))
    assert body[:4] == b"RIFF"
    service.unload()


def test_crash_mid_checkpoint_write_resumes_previous_step(tmp_path):
    """A torn newest checkpoint (process killed mid-write) must not brick
    resume: restore_latest falls back to the last restorable step."""
    import os

    import jax.numpy as jnp

    from f5tts_tpu.train.checkpoint import restore_latest, save_state

    state = {"w": jnp.arange(8, dtype=jnp.float32), "step": jnp.zeros((), jnp.int32)}
    d = str(tmp_path / "ckpts")
    save_state(d, 1, {**state, "step": jnp.asarray(1)})
    save_state(d, 2, {**state, "step": jnp.asarray(2)})

    # tear step 2: truncate/remove files inside the committed dir
    step2 = os.path.join(d, "2")
    for root, _dirs, files in os.walk(step2):
        for f in files:
            os.remove(os.path.join(root, f))

    step, restored = restore_latest(d, state)
    assert step == 1
    assert int(restored["step"]) == 1
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(8, dtype=np.float32))
