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


def test_extra_noise_roundtrip(tmp_path):
    """Free-AT persists the cross-batch noise buffer (the reference's
    global_noise_data) — a resume must get the exact same buffer back."""
    ops = ModelOps(net2())
    x = jnp.zeros((1, 28, 28, 1))
    state = create_train_state(ops, jax.random.PRNGKey(0), x)
    noise = np.random.default_rng(0).standard_normal((4, 28, 28, 1)).astype(np.float32)
    ckpt.save_checkpoint(str(tmp_path), state, epoch=1, arch="Net2",
                         best_prec1=0.0, is_best=False,
                         extra={"noise": noise})
    payload = ckpt.load_checkpoint(str(tmp_path), "last")
    np.testing.assert_array_equal(np.asarray(payload["extra"]["noise"]), noise)


def test_cross_model_roundtrip(tmp_path):
    """Path-keyed restore must work for every model family (different
    nesting shapes), not just whatever leaf order orbax happens to produce."""
    from edge_enhancement_tpu.models.registry import build_model
    args = dict(r=4, w=1.0, gf=False, low=25.0, high=51.0, alpha=0.3,
                sigma=1.0, type_canny="CannyFilter_step125_1",
                epsilon=0.3, n_queries=1, cize=32)
    for arch, shape, nc in [("PreActResNet18_EE_BPDA_3", (1, 32, 32, 3), 200),
                            ("Net2_EE_square", (1, 28, 28, 1), 10)]:
        ops = ModelOps(build_model(arch, args, nc))
        state = create_train_state(ops, jax.random.PRNGKey(1),
                                   jnp.zeros(shape))
        d = str(tmp_path / arch)
        ckpt.save_checkpoint(d, state, epoch=2, arch=arch, best_prec1=1.0,
                             is_best=False)
        restored, epoch, _ = ckpt.restore_into_state(
            state, ckpt.load_checkpoint(d, "last"))
        assert epoch == 2
        flat_a = jax.tree_util.tree_leaves_with_path(state.params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(restored.params))
        for path, leaf in flat_a:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(flat_b[path]))


def test_restore_shape_mismatch_raises(tmp_path):
    ops = ModelOps(net2())
    x = jnp.zeros((1, 28, 28, 1))
    state = create_train_state(ops, jax.random.PRNGKey(0), x)
    ckpt.save_checkpoint(str(tmp_path), state, epoch=1, arch="Net2",
                         best_prec1=0.0, is_best=False)
    payload = ckpt.load_checkpoint(str(tmp_path), "last")
    bad = jax.tree.map(lambda a: jnp.zeros(a.shape + (1,), a.dtype), state.params)
    try:
        ckpt.restore_tree(bad, payload["state"]["params"])
    except ValueError as e:
        assert "shape" in str(e)
    else:
        raise AssertionError("expected shape mismatch to raise")
