"""Sharded checkpoint save/restore via orbax (capability parity with the
reference's full-state torch checkpoints + step resume, ``trainer.py:135-205``)."""

from __future__ import annotations

import os
import re

import jax
from orbax import checkpoint as ocp


def _mngr(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_state(directory: str, step: int, state) -> None:
    mngr = _mngr(directory)
    mngr.save(step, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    mngr.close()


def restore_state(directory: str, step: int, template):
    mngr = _mngr(directory)
    out = mngr.restore(step, args=ocp.args.StandardRestore(template))
    mngr.close()
    return out


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = [int(m.group(1)) for d in os.listdir(directory) if (m := re.fullmatch(r"(\d+)", d))]
    return max(steps) if steps else None


def restore_latest(directory: str, template):
    """Crash-tolerant resume: try checkpoints newest-first, skipping corrupt
    or partially-written steps. An interrupted save normally leaves only an
    uncommitted tmp dir (orbax commits with an atomic rename), but a torn
    copy/truncated file inside a committed-looking step dir must degrade to
    the previous good checkpoint, not brick resume
    (failure-injection contract, tests/test_failure_recovery.py).

    Returns ``(step, state)`` or ``(None, None)`` when nothing restorable."""
    import logging

    if not os.path.isdir(directory):
        return None, None
    steps = sorted(
        (int(m.group(1)) for d in os.listdir(directory) if (m := re.fullmatch(r"(\d+)", d))),
        reverse=True,
    )
    for step in steps:
        try:
            return step, restore_state(directory, step, template)
        except Exception as e:  # corrupt/torn checkpoint: fall back one step
            logging.getLogger("f5tpu.train").warning(
                "checkpoint step %d unrestorable (%s) — falling back", step, e)
    return None, None
