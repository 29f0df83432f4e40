"""Orbax checkpointing of the train state + run metadata.

Replaces the reference's torch.save dicts {epoch, arch, state_dict,
best_prec1, optimizer} (utils/helper.py:58-61) with an Orbax pytree
checkpoint carrying the same information; `best/` mirrors the reference's
best-model copy. Free-AT runs additionally persist the cross-batch noise
buffer (the reference's `global_noise_data`,
AT_hfs_canny_free_imagenet_ddp.py:286) via the `extra` payload so resume
continues the in-run trajectory.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree: Any) -> Any:
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(ckpt_dir: str, state: Any, epoch: int, arch: str,
                    best_prec1: float, is_best: bool,
                    extra: Optional[dict] = None) -> None:
    # multihost: process 0 writes, like the reference's rank-0-only
    # torch.save (experiments_imagenet.py:202) — the state is replicated,
    # so every host holds identical values
    if jax.process_index() != 0:
        return
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"state": _to_host(state),
               "meta": {"epoch": epoch, "arch": arch,
                        "best_prec1": float(best_prec1)}}
    if extra:
        payload["extra"] = _to_host(extra)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, "last"), payload, force=True)
        if is_best:
            ckptr.save(os.path.join(ckpt_dir, "best"), payload, force=True)


def save_noise_shard(ckpt_dir: str, noise) -> None:
    """Multihost free-AT noise persistence: the replay-noise buffer is
    DATA-SHARDED (unlike the replicated TrainState), so the rank-0 orbax
    payload cannot carry it — every process writes its own local portion to
    `noise_p{rank}.npy` and reads it back on resume (reference keeps
    `global_noise_data` alive per-GPU process,
    AT_hfs_canny_free_imagenet_ddp.py:284-337)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    # local rows in global order; dedup by row offset (a model>1 mesh axis
    # replicates each row range across several local devices)
    rows = {}
    for s in noise.addressable_shards:
        start = s.index[0].start or 0
        if start not in rows:
            rows[start] = np.asarray(s.data)
    local = np.concatenate([rows[k] for k in sorted(rows)], axis=0)
    path = os.path.join(ckpt_dir, f"noise_p{jax.process_index()}.npy")
    tmp = path[:-4] + ".tmp.npy"  # np.save appends .npy unless present
    np.save(tmp, local)
    os.replace(tmp, path)  # atomic: a crashed save never leaves a torn file


def load_noise_shard(ckpt_dir: str) -> Optional[np.ndarray]:
    """This process's persisted free-AT noise rows (None if absent)."""
    path = os.path.join(os.path.abspath(ckpt_dir),
                        f"noise_p{jax.process_index()}.npy")
    return np.load(path) if os.path.exists(path) else None


def load_checkpoint(ckpt_dir: str, which: str = "last") -> Optional[dict]:
    path = os.path.join(os.path.abspath(ckpt_dir), which)
    if not os.path.exists(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def _fetch_by_path(saved: Any, path) -> Any:
    """Walk a restored (nested dict/list) checkpoint node by a jax key path."""
    node = saved
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            node = node[p.key]
        elif isinstance(p, jax.tree_util.SequenceKey):
            node = node[p.idx]
        elif isinstance(p, jax.tree_util.GetAttrKey):
            node = node[p.name]
        else:
            raise KeyError(f"unsupported key path element {p!r}")
    return node


def restore_tree(target: Any, saved: Any) -> Any:
    """Path-keyed restoration: every leaf of `target` is looked up by its
    own key path in the restored checkpoint dict — no dependence on
    flattened leaf ordering. Shapes are checked leaf-by-leaf."""
    def pick(path, leaf):
        val = np.asarray(_fetch_by_path(saved, path))
        if hasattr(leaf, "shape") and tuple(val.shape) != tuple(leaf.shape):
            name = jax.tree_util.keystr(path)
            raise ValueError(f"checkpoint leaf {name} has shape {val.shape}, "
                             f"expected {leaf.shape}")
        return val
    return jax.tree_util.tree_map_with_path(pick, target)


def restore_into_state(state: Any, payload: dict) -> tuple[Any, int, float]:
    """Rebuild a TrainState from a checkpoint payload, keyed by tree paths
    (robust to any container/field ordering differences between the live
    dataclass and orbax's restored nested dicts)."""
    saved = payload["state"]
    restored = state.replace(
        params=restore_tree(state.params, saved["params"]),
        batch_stats=restore_tree(state.batch_stats, saved["batch_stats"]),
        momentum_buf=restore_tree(state.momentum_buf, saved["momentum_buf"]),
        step=np.asarray(saved["step"]) if "step" in saved else state.step)
    meta = payload["meta"]
    return restored, int(meta["epoch"]), float(meta["best_prec1"])
