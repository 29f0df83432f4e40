"""U2NETP forward parity vs the reference implementation on copied weights.

Exercises the parameterised RSU implementation (the reference spells out
RSU7/6/5/4 as separate classes), the ceil-mode pooling, bilinear
`_upsample_like` resizing, side-output heads, and the fused 1x1 output conv
(utils/u2net.py:435-538) in one shot: eval-mode fused sigmoid maps must
match elementwise on copied weights.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

import test_step_parity_resnet  # noqa: F401,E402  (torch shims + sys.path)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from edge_enhancement_tpu.models.u2net import U2Net  # noqa: E402


def _rsu_map(levels):
    """torch REBNCONV name inside an RSU-L -> flax REBNConv index
    (see models/u2net.py::RSU call order)."""
    m = {"rebnconvin": 0}
    for k in range(1, levels + 1):
        m[f"rebnconv{k}"] = k
    for md in range(1, levels):            # rebnconv{m}d -> 2L - m
        m[f"rebnconv{md}d"] = 2 * levels - md
    return m


def _rsu4f_map():
    m = {"rebnconvin": 0}
    for k in range(1, 5):
        m[f"rebnconv{k}"] = k
    m.update({"rebnconv3d": 5, "rebnconv2d": 6, "rebnconv1d": 7})
    return m


# U2NETP stage -> (flax top-level scope, inner-name map)
_STAGES = {
    "stage1": ("RSU_0", _rsu_map(7)), "stage2": ("RSU_1", _rsu_map(6)),
    "stage3": ("RSU_2", _rsu_map(5)), "stage4": ("RSU_3", _rsu_map(4)),
    "stage5": ("RSU4F_0", _rsu4f_map()), "stage6": ("RSU4F_1", _rsu4f_map()),
    "stage5d": ("RSU4F_2", _rsu4f_map()), "stage4d": ("RSU_4", _rsu_map(4)),
    "stage3d": ("RSU_5", _rsu_map(5)), "stage2d": ("RSU_6", _rsu_map(6)),
    "stage1d": ("RSU_7", _rsu_map(7)),
}
_HEADS = {f"side{i}": f"Conv_{i - 1}" for i in range(1, 7)}
_HEADS["outconv"] = "Conv_6"


def _copy_weights(tmodel, params, stats):
    params = jax.tree.map(np.asarray, params)
    stats = jax.tree.map(np.asarray, stats)
    n = 0
    for sname, (scope, inner) in _STAGES.items():
        tstage = getattr(tmodel, sname)
        for tname, idx in inner.items():
            reb = getattr(tstage, tname)
            leaf = f"REBNConv_{idx}"
            p = params[scope][leaf]
            p["Conv_0"]["kernel"] = \
                reb.conv_s1.weight.detach().numpy().transpose(2, 3, 1, 0).copy()
            p["Conv_0"]["bias"] = reb.conv_s1.bias.detach().numpy().copy()
            p["BatchNorm_0"]["scale"] = reb.bn_s1.weight.detach().numpy().copy()
            p["BatchNorm_0"]["bias"] = reb.bn_s1.bias.detach().numpy().copy()
            s = stats[scope][leaf]["BatchNorm_0"]
            s["mean"] = reb.bn_s1.running_mean.detach().numpy().copy()
            s["var"] = reb.bn_s1.running_var.detach().numpy().copy()
            n += 1
    for tname, scope in _HEADS.items():
        conv = getattr(tmodel, tname)
        params[scope]["kernel"] = \
            conv.weight.detach().numpy().transpose(2, 3, 1, 0).copy()
        params[scope]["bias"] = conv.bias.detach().numpy().copy()
        n += 1
    return params, stats, n


def _build_pair(full: bool):
    from utils.u2net import U2NET, U2NETP

    torch.manual_seed(0)
    tmodel = U2NET(3, 1) if full else U2NETP(3, 1)
    tmodel.eval()
    # non-default BN stats so the eval normalization is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    model = U2Net(full=full)
    rng = np.random.default_rng(9)
    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    params, stats, n = _copy_weights(tmodel, variables["params"],
                                     variables["batch_stats"])
    assert n == 112 + 7  # 112 REBNCONVs + 6 side heads + outconv
    return tmodel, model, params, stats, x


def test_u2netp_forward_parity():
    tmodel, model, params, stats, x = _build_pair(full=False)
    out_j = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), False)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        out_t = tmodel(xt)
    np.testing.assert_allclose(np.asarray(out_j)[..., 0],
                               out_t.numpy()[:, 0], atol=1e-4)


def test_u2net_full_forward_parity():
    """The 7-map full variant (u2net.py:329-431): same parameterised blocks,
    its own stage widths (mid 32/32/64/128/256, out 64..512) — all seven
    sigmoid maps (fused + d1..d6) must match elementwise on copied weights."""
    tmodel, model, params, stats, x = _build_pair(full=True)
    outs_j = model.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(x), False)
    assert isinstance(outs_j, tuple) and len(outs_j) == 7
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        outs_t = tmodel(xt)
    for i, (oj, ot) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(np.asarray(oj)[..., 0],
                                   ot.numpy()[:, 0], atol=1e-4,
                                   err_msg=f"map {i}")
