"""Multi-host launch: one jax.distributed program spanning hosts.

The reference's only multi-process story is Accelerate DDP inside the trainer
(``model/trainer.py:53-65``); serving is strictly single-process. Here both
trainer and serving engine run as a single pjit program over all hosts:

- ``init_distributed()`` wires ``jax.distributed.initialize`` from env
  (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or TPU metadata when
  available).
- ``global_mesh(model_parallel)`` builds the global ('data','model') mesh with
  the ``model`` axis kept inside a host's ICI domain (contiguous local
  devices) and ``data`` spanning hosts (ICI within slice, DCN across slices).
- serving topology (BASELINE config #5): each host feeds its local continuous
  batcher; TP shards ride ICI via the in-jit collectives; host-level request
  queues stay independent so no global Python coordinator sits on the hot
  path. Aggregate throughput = sum of host throughputs, which is what the
  scaling-efficiency metric measures.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from f5tts_tpu.parallel.mesh import build_mesh


def init_distributed() -> tuple[int, int]:
    """Initialize multi-host JAX if env says so; returns (process_id, n_processes)."""
    coord = os.environ.get("COORDINATOR_ADDRESS")
    n_proc = int(os.environ.get("NUM_PROCESSES", "1"))
    pid = int(os.environ.get("PROCESS_ID", "0"))
    if n_proc > 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=n_proc,
            process_id=pid,
        )
    return pid, n_proc


def global_mesh(model_parallel: int = 1):
    """('data','model') mesh over all global devices; ``model`` stays within
    contiguous (ICI-adjacent) device groups."""
    return build_mesh(model_parallel=model_parallel, devices=jax.devices())


def local_batch_slice(global_batch: int) -> slice:
    """The rows of a global batch this host is responsible for feeding."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def make_global_batch(local_arrays: dict, mesh, batch_axis: str = "data") -> dict:
    """Assemble per-host numpy shards into global jax.Arrays sharded over the
    batch axis (`jax.make_array_from_process_local_data`). Single-process runs
    pass through unchanged — the trainer calls this unconditionally.

    Every host must call with its own rows of the same global batch (use
    ``local_batch_slice`` against a seed-synchronized ``pack_batches`` order so
    all hosts agree on batch composition without communicating).
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return {k: jnp.asarray(v) for k, v in local_arrays.items()}
    sharding = NamedSharding(mesh, P(batch_axis))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in local_arrays.items()
    }
