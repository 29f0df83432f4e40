"""Serving-export round trip: StableHLO artifact == live eval forward."""

import numpy as np
import jax
import jax.numpy as jnp

from edge_enhancement_tpu.models.registry import build_model
from edge_enhancement_tpu.train.modelops import ModelOps
from edge_enhancement_tpu.train.trainer import create_train_state
from edge_enhancement_tpu.utils.export import (load_serving_artifact,
                                               save_serving_artifact)

ARGS = dict(r=8, w=1.0, gf=False, low=38.0, high=76.0, alpha=0.0, sigma=1.0,
            type_canny="CannyFilter_step125_1", epsilon=0.0627, n_queries=1,
            cize=28)


def test_roundtrip_matches_live_forward(tmp_path):
    model = build_model("Net2_EE_square", ARGS, 10)
    ops = ModelOps(model)
    state = create_train_state(ops, jax.random.PRNGKey(0),
                               jnp.zeros((1, 28, 28, 1)))
    path = str(tmp_path / "m.stablehlo")
    save_serving_artifact(path, ops, state.params, state.batch_stats, 28, 1)

    fn = load_serving_artifact(path)
    x = np.random.default_rng(0).random((4, 28, 28, 1)).astype(np.float32)
    got = np.asarray(fn(x, 7))
    want = np.asarray(ops.logits_eval(state.params, state.batch_stats,
                                      jnp.asarray(x), jax.random.PRNGKey(7)))
    assert got.shape == (4, 10)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # symbolic batch: the same artifact serves another batch size
    got2 = np.asarray(fn(x[:2], 7))
    np.testing.assert_allclose(got2, want[:2], rtol=1e-5, atol=1e-5)
