"""Tensor-parallel correctness: the data=4 x model=2 fused PGD-AT train step
must produce numerically identical results to the pure data-parallel
(replicated-parameter) 8-device step on the same global batch.

`dryrun_multichip(8)` proves the TP program compiles, executes, and keeps
its kernel layout; this test upgrades that liveness check into the
correctness analogue of what test_multiprocess proves for DP: GSPMD's
inserted collectives (all-gathers over the 'model' axis in the forward,
reduce-scatters in the backward) change the schedule, not the math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_enhancement_tpu.models.cnn_mnist import net2
from edge_enhancement_tpu.objectives.methods import MethodConfig
from edge_enhancement_tpu.parallel import mesh as meshlib
from edge_enhancement_tpu.parallel import sharding as shardlib
from edge_enhancement_tpu.train.modelops import ModelOps
from edge_enhancement_tpu.train.trainer import (OptimConfig, build_train_step,
                                                create_train_state)


def _run(mesh, ops, state0, x, y, state_sharding=None):
    mcfg = MethodConfig("AT", epsilon=0.3, num_steps=2, step_size=0.1,
                        num_classes=10)
    step = build_train_step(ops, mcfg, OptimConfig(momentum=0.9,
                                                   weight_decay=1e-4),
                            mesh=mesh, state_sharding=state_sharding)
    xb, yb = meshlib.shard_batch(mesh, (x, y))
    new_state, metrics = step(state0, xb, yb, jax.random.PRNGKey(1),
                              jnp.float32(0.1))
    return jax.device_get(new_state), jax.device_get(metrics)


def test_tp_step_matches_dp_step():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    ops = ModelOps(net2())
    rng = np.random.default_rng(3)
    x = rng.random((16, 28, 28, 1)).astype(np.float32)
    y = (np.arange(16) % 10).astype(np.int32)
    state = create_train_state(ops, jax.random.PRNGKey(0), jnp.asarray(x[:1]))

    # pure DP: 8-way batch shard, replicated params
    mesh_dp = meshlib.make_mesh(n_data=8, n_model=1)
    st_dp, m_dp = _run(mesh_dp, ops, meshlib.replicate(mesh_dp, state), x, y)

    # DP x TP: 4-way batch shard, conv/dense kernels (+ grads + momentum)
    # column-sharded over the 2-way 'model' axis
    mesh_tp = meshlib.make_mesh(n_data=4, n_model=2)
    s_tp = shardlib.shard_state(mesh_tp, state)
    # sanity: the layout really is tensor-parallel, not replicated
    assert "model" in str(s_tp.params["Dense_0"]["kernel"].sharding.spec)
    st_tp, m_tp = _run(mesh_tp, ops, s_tp, x, y,
                       state_sharding=shardlib.state_shardings(mesh_tp, s_tp))

    np.testing.assert_allclose(m_tp["loss"], m_dp["loss"], rtol=1e-5)
    np.testing.assert_allclose(m_tp["top1"], m_dp["top1"], rtol=1e-6)
    # every parameter / momentum / BN-stat leaf agrees elementwise
    flat_dp = jax.tree_util.tree_flatten_with_path(
        {"p": st_dp.params, "m": st_dp.momentum_buf, "b": st_dp.batch_stats})[0]
    flat_tp = jax.tree_util.tree_flatten_with_path(
        {"p": st_tp.params, "m": st_tp.momentum_buf, "b": st_tp.batch_stats})[0]
    assert len(flat_dp) == len(flat_tp)
    for (path_d, leaf_d), (path_t, leaf_t) in zip(flat_dp, flat_tp):
        assert path_d == path_t
        np.testing.assert_allclose(
            np.asarray(leaf_t), np.asarray(leaf_d), atol=2e-6, rtol=2e-5,
            err_msg=jax.tree_util.keystr(path_d))
