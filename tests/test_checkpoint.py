"""Checkpoint round-trip: save -> restore -> identical state; best-copy
semantics; resume metadata."""

import numpy as np
import jax
import jax.numpy as jnp

from edge_enhancement_tpu.models.cnn_mnist import net2
from edge_enhancement_tpu.train import checkpoint as ckpt
from edge_enhancement_tpu.train.modelops import ModelOps
from edge_enhancement_tpu.train.trainer import create_train_state


def test_roundtrip(tmp_path):
    ops = ModelOps(net2())
    x = jnp.zeros((1, 28, 28, 1))
    state = create_train_state(ops, jax.random.PRNGKey(0), x)

    ckpt.save_checkpoint(str(tmp_path), state, epoch=3, arch="Net2",
                         best_prec1=42.5, is_best=True)
    payload = ckpt.load_checkpoint(str(tmp_path), "last")
    assert payload is not None
    restored, epoch, best = ckpt.restore_into_state(state, payload)
    assert epoch == 3 and best == 42.5
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # best copy exists and matches
    best_payload = ckpt.load_checkpoint(str(tmp_path), "best")
    assert best_payload is not None

    # non-best save does not touch best/
    state2 = create_train_state(ops, jax.random.PRNGKey(9), x)
    ckpt.save_checkpoint(str(tmp_path), state2, epoch=4, arch="Net2",
                         best_prec1=42.5, is_best=False)
    best_payload2 = ckpt.load_checkpoint(str(tmp_path), "best")
    r_best, epoch_b, _ = ckpt.restore_into_state(state, best_payload2)
    assert epoch_b == 3  # still the old best
    r_last, epoch_l, _ = ckpt.restore_into_state(state, ckpt.load_checkpoint(str(tmp_path), "last"))
    assert epoch_l == 4


def test_missing_returns_none(tmp_path):
    assert ckpt.load_checkpoint(str(tmp_path / "nope")) is None
