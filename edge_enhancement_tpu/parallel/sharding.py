"""Parameter sharding rules for the optional 'model' (tensor-parallel) axis.

The reference has no tensor parallelism (SURVEY.md §2.6) — data parallelism
covers its workloads — but the framework's mesh carries a 'model' axis so
larger backbones can shard their weight matrices. The rules here implement
output-channel (column) parallelism for conv/dense kernels: with GSPMD, jit
partitions the matmuls across the axis and inserts the all-gathers/reduces
automatically — the model code is unchanged.

Shardings:
  dense kernel (in, out)        -> P(None, 'model')
  conv kernel (h, w, in, out)   -> P(None, None, None, 'model')
  biases / BN params / stats    -> replicated
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _key_name(p) -> str:
    """Path entry name for DictKey (.key), GetAttrKey (.name), or sequence."""
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def param_spec(path, leaf) -> P:
    name = _key_name(path[-1]) if path else ""
    if name == "kernel" and leaf.ndim == 2:
        return P(None, "model")
    if name == "kernel" and leaf.ndim == 4:
        return P(None, None, None, "model")
    return P()


def shard_params(mesh: Mesh, params: Any) -> Any:
    """device_put params with TP rules (no-op placement when model axis is 1)."""
    def put(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, param_spec(path, leaf)))

    return jax.tree_util.tree_map_with_path(put, params)


def state_shardings(mesh: Mesh, state: Any):
    """Matching sharding pytree for a TrainState (params + momentum sharded
    by the same rules; batch_stats and step replicated)."""
    def spec_of(path, leaf):
        keys = [_key_name(p) for p in path]
        if keys and keys[0] in ("params", "momentum_buf"):
            return NamedSharding(mesh, param_spec(path[1:], leaf))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_of, state)


def shard_state(mesh: Mesh, state: Any) -> Any:
    shardings = state_shardings(mesh, state)
    return jax.tree.map(jax.device_put, state, shardings)
