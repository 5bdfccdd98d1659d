"""Parameter sharding rules: data-parallel, FSDP-style, and tensor-parallel
layouts over the (data, model) mesh.

The reference has exactly one strategy (DDP, SURVEY.md §2.3); this module is
the TPU-native scaling surface beyond it. Rather than invading the model code
with `nn.with_partitioning`, shardings are assigned from *param-path rules* at
trainer setup, and XLA's sharding propagation inserts the collectives
(all-gather for FSDP params on use, reduce-scatter on grads; all-reduce across
the tensor-parallel axis at block boundaries):

* `replicated` — params on every chip (plain DP; default).
* `fsdp`       — every weight >= `min_fsdp_size` is sharded along its largest
                 divisible axis over the DATA axis (ZeRO-3-flavoured; params
                 gather on use, optimizer state stays sharded).
* `tp`         — Megatron-style layout on the MODEL axis:
                 qkv/up projections column-sharded, out/down projections
                 row-sharded, embeddings vocab-sharded; everything else
                 replicated.
* `fsdp+tp`    — tp rules first, remaining large params fsdp-sharded.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["param_partition_spec", "make_param_shardings", "shard_params"]

# param-name suffixes that get Megatron column/row sharding on the model axis
_COLUMN_PARALLEL = ("to_qkv", "proj_in", "to_q", "to_kv")  # shard output dim
_ROW_PARALLEL = ("to_out", "proj_out")  # shard input dim
_VOCAB_PARALLEL = ("to_cond_emb", "to_phoneme_emb", "text_embed", "sem_embed")


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", str(k))
        names.append(str(name))
    return tuple(names)


def param_partition_spec(
    path,
    param,
    mode: str = "replicated",
    mesh_shape: Optional[dict] = None,
    min_fsdp_size: int = 2**16,
) -> P:
    """PartitionSpec for one parameter, by path rules."""
    if mode == "replicated":
        return P()

    names = _path_names(path)
    ndim = param.ndim
    model_n = (mesh_shape or {}).get(MODEL_AXIS, 1)
    data_n = (mesh_shape or {}).get(DATA_AXIS, 1)

    spec = [None] * ndim

    if "tp" in mode and model_n > 1 and ndim >= 2:
        parent = names[-2] if len(names) >= 2 else ""
        if any(s in parent for s in _COLUMN_PARALLEL) and param.shape[-1] % model_n == 0:
            spec[-1] = MODEL_AXIS
        elif any(s in parent for s in _ROW_PARALLEL) and param.shape[-2] % model_n == 0:
            spec[-2] = MODEL_AXIS
        elif any(s in parent for s in _VOCAB_PARALLEL) and param.shape[0] % model_n == 0:
            spec[0] = MODEL_AXIS

    if "fsdp" in mode and data_n > 1 and param.size >= min_fsdp_size:
        # shard the largest still-unsharded divisible axis over the data axis
        order = sorted(range(ndim), key=lambda i: -param.shape[i])
        for ax in order:
            if spec[ax] is None and param.shape[ax] % data_n == 0:
                spec[ax] = DATA_AXIS
                break

    return P(*spec)


def make_param_shardings(mesh: Mesh, params, mode: str = "replicated",
                         min_fsdp_size: int = 2**16):
    """Tree of NamedShardings matching `params`."""
    mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))

    def one(path, p):
        spec = param_partition_spec(path, p, mode, mesh_shape, min_fsdp_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(mesh: Mesh, params, mode: str = "replicated", **kwargs):
    """Place params on the mesh according to the mode's rules."""
    shardings = make_param_shardings(mesh, params, mode, **kwargs)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
