"""Device mesh + sharding helpers.

The reference delegates distribution to HF `accelerate` / NCCL DDP
(trainer.py:89-95). The TPU-native equivalent is SPMD over a
`jax.sharding.Mesh`: the train step is jitted with the batch sharded over the
'data' axis and params replicated; gradient reduction compiles to an XLA
`psum` over ICI. A 'model' axis is part of the mesh shape so tensor-parallel
shardings can be layered in without re-plumbing (the reference has no TP —
SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "DATA_AXIS",
    "MODEL_AXIS",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to pure data parallelism over every device — the reference's only
    strategy (DDP, trainer.py:89-95) — with a 'model' axis of size 1 reserved
    for TP.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        assert n % model_parallel == 0
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (
        f"mesh {data_parallel}x{model_parallel} != {n} devices"
    )
    dev_array = np.array(devices).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along the leading axis."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
