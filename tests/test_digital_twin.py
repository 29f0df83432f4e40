"""CI-able digital twin: the reference torch driver and our stack train the
flagship EE_BPDA3_AT_square recipe on the same on-disk dataset from the same
initial weights (tools/digital_twin.py; the full-length run and report live
in docs/TWIN.md / output/twin/twin.json).

Deterministic assertions first (init conversion produces IDENTICAL eval
logits; the idx files round-trip through our real MNIST loader), then
statistical ones on the shortened trajectories (both sides learn; final
clean accuracies agree within a band sized for this tiny regime).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from digital_twin import (RECIPE, _install_reference_shims,  # noqa: E402
                          make_dataset, run_ours, run_reference)

EPOCHS, NTRAIN, NVAL, STEPS = 5, 600, 200, 10


@pytest.mark.slow
def test_digital_twin_mini(tmp_path):
    data_dir = make_dataset(str(tmp_path / "data"), NTRAIN, NVAL, seed=0)

    # our real-layout MNIST loader reads the generated idx files
    from edge_enhancement_tpu.data.datasets import get_dataset
    tr, spec = get_dataset("mnist", data_dir, train=True)
    va, _ = get_dataset("mnist", data_dir, train=False)
    assert len(tr) == NTRAIN and len(va) == NVAL
    x0, y0 = next(va.batches(8, shuffle=False, seed=0))
    assert x0.shape == (8, 28, 28, 1) and x0.max() > 0.5

    ref = run_reference(data_dir, str(tmp_path / "ref"), EPOCHS, STEPS, seed=1)

    # deterministic: the converted INIT weights produce identical eval logits
    import jax
    import jax.numpy as jnp
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import create_train_state
    from digital_twin import RECIPE as R
    from tools.convert_torch_checkpoint import convert, mnist_name_map

    _install_reference_shims()
    # the _square variants draw a RANDOM square every forward, so logits
    # can't be compared across frameworks; the non-square EE twin shares the
    # exact same backbone weights (conv1/conv2/fc1/fc2) and front-end chain
    from models_mnist import Net2_EE

    tmodel = Net2_EE(r=R["r"], w=R["w"], with_gf=R["gf"], low=R["low"],
                     high=R["high"], alpha=R["alpha"], sigma=R["sigma"])
    tmodel.load_state_dict(torch.load(ref["init_pth"],
                                      map_location="cpu")["state_dict"],
                           strict=False)
    tmodel.eval()
    cfg_args = dict(r=R["r"], w=R["w"], gf=R["gf"], low=R["low"],
                    high=R["high"], alpha=R["alpha"], sigma=R["sigma"],
                    type_canny="CannyFilter", epsilon=R["epsilon"],
                    n_queries=R["n_queries"], cize=28)
    ops = ModelOps(build_model("Net2_EE", cfg_args, 10))
    st = create_train_state(ops, jax.random.PRNGKey(1),
                            jnp.zeros((1, 28, 28, 1)))
    params, stats, matched, _ = convert(
        torch.load(ref["init_pth"], map_location="cpu")["state_dict"],
        mnist_name_map(), st.params, st.batch_stats)
    assert matched == 8
    lj = np.asarray(ops.logits_eval(params, stats, jnp.asarray(x0),
                                    jax.random.PRNGKey(0)))
    with torch.no_grad():
        lt = tmodel(torch.from_numpy(
            np.ascontiguousarray(x0.transpose(0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(lj, lt, atol=1e-4)

    ours = run_ours(data_dir, ref["init_pth"], EPOCHS, STEPS, seed=1)

    # mid-training AT on a dropout net is chaotic (the full-length run in
    # docs/TWIN.md shows a ~18-point seed band pre-convergence and <1-point
    # agreement at convergence, which this shortened run can't reach for
    # the torch side) — so compare best-over-epochs capability, which is
    # stable against the per-epoch wobble, plus learnability floors
    ref_best = max(ref["history"]["clean"])
    ours_best = max(ours["history"]["clean"])
    assert ref_best >= 70.0, ref["history"]
    assert ours_best >= 70.0, ours["history"]
    assert max(ref["history"]["adv"]) > 30.0, ref["history"]
    assert max(ours["history"]["adv"]) > 30.0, ours["history"]
    assert abs(ref_best - ours_best) <= 25.0, \
        (ref["history"], ours["history"])
