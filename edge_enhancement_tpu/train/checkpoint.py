"""Orbax checkpointing of the train state + run metadata.

Replaces the reference's torch.save dicts {epoch, arch, state_dict,
best_prec1, optimizer} (utils/helper.py:58-61) with an Orbax pytree
checkpoint carrying the same information; `best/` mirrors the reference's
best-model copy.
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
                    best_prec1: float, is_best: bool) -> None:
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"state": _to_host(state),
               "meta": {"epoch": epoch, "arch": arch,
                        "best_prec1": float(best_prec1)}}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, "last"), payload, force=True)
        if is_best:
            ckptr.save(os.path.join(ckpt_dir, "best"), payload, force=True)


def load_checkpoint(ckpt_dir: str, which: str = "last") -> Optional[dict]:
    path = os.path.join(os.path.abspath(ckpt_dir), which)
    if not os.path.exists(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def restore_into_state(state: Any, payload: dict) -> tuple[Any, int, float]:
    """Rebuild a TrainState from a checkpoint payload.

    Orbax restores nested DICTS (alphabetical leaf order), while the
    TrainState dataclass flattens in field order — rebuild field-by-field
    so the collections land in the right slots."""
    saved = payload["state"]
    restored = state.replace(
        params=jax.tree.unflatten(jax.tree.structure(state.params),
                                  jax.tree.leaves(saved["params"])),
        batch_stats=jax.tree.unflatten(jax.tree.structure(state.batch_stats),
                                       jax.tree.leaves(saved["batch_stats"])),
        momentum_buf=jax.tree.unflatten(jax.tree.structure(state.momentum_buf),
                                        jax.tree.leaves(saved["momentum_buf"])),
        step=jax.tree.leaves(saved["step"])[0] if jax.tree.leaves(saved["step"])
        else state.step)
    meta = payload["meta"]
    return restored, int(meta["epoch"]), float(meta["best_prec1"])
