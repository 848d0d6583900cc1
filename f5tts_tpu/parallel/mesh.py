"""Device-mesh construction.

The reference's only distributed machinery is Accelerate DDP in the trainer
(``model/trainer.py:53-65``, NCCL). The TPU-native replacement is a single
2-D ``jax.sharding.Mesh`` with axes ``('data', 'model')``: gradients/batches
shard over ``data`` (ICI/DCN), tensor-parallel weight shards over ``model``
(kept on ICI within a host/slice). Collectives are inserted by XLA from
NamedSharding annotations — no hand-written NCCL calls to translate.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    model_parallel: int = 1,
    devices=None,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Mesh of shape (n_devices // model_parallel, model_parallel).

    ``model`` is the minor (fastest-varying) axis so TP shards land on
    ICI-adjacent chips in the default device order.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
