#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint into this framework's Orbax format.

The reference saves torch dicts {epoch, arch, state_dict, best_prec1,
optimizer} (utils/helper.py:58-61). This tool maps the state_dict onto our
flax parameter tree (NCHW->NHWC kernel transposes, BN buffer renames) and
writes a checkpoint `train.py --resume` / `eval.py --resume` can load — so
users migrating from the reference can evaluate or fine-tune their existing
trained models directly.

    python tools/convert_torch_checkpoint.py <ckpt.pth> <out_dir> \
        --arch resnet18_EE_square --num-classes 200 [--cize 64] [...]

Supported families: resnet{18,34,50,101,152}[_EE[_square]|_fd],
PreActResNet18[_EE[_BPDA[_3]]], Net2[_EE[_square]].
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


# ---------------------------------------------------------------------------
# torch name -> flax path maps
# ---------------------------------------------------------------------------

_RESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                  101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def resnet_name_map(depth: int, fd: bool = False) -> dict:
    """torch module name -> flax module path (torchvision-style ResNet;
    flax auto-names follow call order, see tests/test_step_parity_resnet.py).

    fd=True adds the ResNet_fd denoising blocks (resnet_fd.py:156-180:
    denoise{1..4} after each layer group). Only conv3 + bn carry into our
    DenoisingBlock: with embed=False the reference's conv1/conv2 are dead
    parameters (never used in forward, so they receive no gradient and stay
    at init for the whole run)."""
    bottleneck = depth >= 50
    blk_cls = "Bottleneck" if bottleneck else "BasicBlock"
    m = {"conv1": ("Conv_0",), "bn1": ("BatchNorm_0",), "fc": ("Dense_0",)}
    if fd:
        for d in range(4):
            m[f"denoise{d + 1}.conv3"] = (f"DenoisingBlock_{d}", "Conv_0")
            m[f"denoise{d + 1}.bn"] = (f"DenoisingBlock_{d}", "BatchNorm_0")
    k = 0
    for li, n in enumerate(_RESNET_LAYERS[depth]):
        for i in range(n):
            blk = f"{blk_cls}_{k}"
            k += 1
            base = f"layer{li + 1}.{i}"
            n_convs = 3 if bottleneck else 2
            for ci in range(n_convs):
                m[f"{base}.conv{ci + 1}"] = (blk, f"Conv_{ci}")
                m[f"{base}.bn{ci + 1}"] = (blk, f"BatchNorm_{ci}")
            m[f"{base}.downsample.0"] = (blk, f"Conv_{n_convs}")
            m[f"{base}.downsample.1"] = (blk, f"BatchNorm_{n_convs}")
    return m


def preact_name_map(depth: int) -> dict:
    """AWP PreActResNet-18 (preactresnet.py:15-33). In our flax block the
    projection shortcut conv is created FIRST, so within a projecting block
    the scopes are Conv_0=shortcut, Conv_1=conv1, Conv_2=conv2; blocks
    without projection use Conv_0=conv1, Conv_1=conv2."""
    assert depth == 18, "PreActResNet map implemented for depth 18"
    # head is 'fc' for (Tiny-)ImageNet stems and 'linear' for CIFAR
    # (preactresnet.py:104-111); absent names are skipped
    m = {"conv1": ("Conv_0",), "bn1": ("BatchNorm_0",),  # 7x7 stem variant
         "bn": ("BatchNorm_1",), "linear": ("Dense_0",),
         "fc": ("Dense_0",)}
    k = 0
    in_planes = 64
    for li, n in enumerate(_RESNET_LAYERS[18]):
        planes = 64 * (2 ** li)
        for i in range(n):
            blk = f"PreActBlock_{k}"
            k += 1
            stride = 2 if (li > 0 and i == 0) else 1
            proj = stride != 1 or in_planes != planes
            in_planes = planes
            base = f"layer{li + 1}.{i}"
            m[f"{base}.bn1"] = (blk, "BatchNorm_0")
            m[f"{base}.bn2"] = (blk, "BatchNorm_1")
            if proj:
                m[f"{base}.shortcut.0"] = (blk, "Conv_0")
                m[f"{base}.conv1"] = (blk, "Conv_1")
                m[f"{base}.conv2"] = (blk, "Conv_2")
            else:
                m[f"{base}.conv1"] = (blk, "Conv_0")
                m[f"{base}.conv2"] = (blk, "Conv_1")
    return m


# dense layers whose INPUT is a flattened conv map: torch flattens NCHW
# (c*H*W + h*W + w) while we flatten NHWC — remap the input rows.
# Net2: conv2+pool leaves (C,H,W) = (64, 4, 4) at 28x28 input.
_FLATTEN_REMAP = {"fc1": (64, 4, 4)}


def mnist_name_map() -> dict:
    return {"conv1": ("Conv_0",), "conv2": ("Conv_1",),
            "fc1": ("Dense_0",), "fc2": ("Dense_1",)}


def _leaf_arrays(state_dict, tname, kind):
    """Extract flax leaves from the torch tensors of one module."""
    out = {}
    w = state_dict.get(tname + ".weight")
    b = state_dict.get(tname + ".bias")
    if kind == "conv":
        out["kernel"] = np.asarray(w).transpose(2, 3, 1, 0)
        if b is not None:
            out["bias"] = np.asarray(b)
    elif kind == "dense":
        w = np.asarray(w)                       # (out, in)
        leaf = tname.rsplit(".", 1)[-1]
        if leaf in _FLATTEN_REMAP:
            c, h, ww = _FLATTEN_REMAP[leaf]
            idx = np.arange(c * h * ww)
            ci, hi, wi = idx // (h * ww), (idx % (h * ww)) // ww, idx % ww
            nhwc_pos = hi * (ww * c) + wi * c + ci
            remap = np.zeros_like(w)
            remap[:, nhwc_pos] = w[:, idx]
            w = remap
        out["kernel"] = w.T
        if b is not None:
            out["bias"] = np.asarray(b)
    elif kind == "bn":
        out["scale"] = np.asarray(w)
        out["bias"] = np.asarray(b)
        out["mean"] = np.asarray(state_dict[tname + ".running_mean"])
        out["var"] = np.asarray(state_dict[tname + ".running_var"])
    return out


def convert(state_dict: dict, name_map: dict, params, batch_stats,
            on_mismatch: str = "raise"):
    """Fill our (params, batch_stats) trees from a torch state_dict.

    on_mismatch: 'raise' for full-checkpoint conversion (every mapped tensor
    must fit), or 'skip' for torchvision-pretrained warm starts where the
    classifier head legitimately differs (the reference replaces model.fc
    after loading 1000-class weights, experiments_tinyimagenet.py:60-70).
    Returns (params, batch_stats, matched_count, skipped_paths)."""
    import jax

    by_path = {}
    for tname, fpath in name_map.items():
        if tname + ".weight" not in state_dict:
            if tname + ".running_mean" not in state_dict:
                continue                     # module absent (e.g. no proj)
        w = state_dict.get(tname + ".weight")
        if tname + ".running_mean" in state_dict:
            kind = "bn"
        elif w is not None and np.asarray(w).ndim == 4:
            kind = "conv"
        else:
            kind = "dense"
        for leaf_name, arr in _leaf_arrays(state_dict, tname, kind).items():
            by_path[fpath + (leaf_name,)] = arr

    matched = [0]
    skipped = []

    def fill(tree, stats: bool):
        def pick(path, leaf):
            keys = tuple(getattr(p, "key", str(p)) for p in path)
            if keys in by_path:
                arr = by_path[keys]
                if arr.shape != leaf.shape:
                    if on_mismatch == "skip":
                        skipped.append((keys, arr.shape, leaf.shape))
                        return np.asarray(leaf)
                    raise ValueError(f"{keys}: torch {arr.shape} vs "
                                     f"flax {leaf.shape}")
                matched[0] += 1
                return arr.astype(np.asarray(leaf).dtype)
            # BN param vs stat separation: stats tree wants mean/var only
            return np.asarray(leaf)
        return jax.tree_util.tree_map_with_path(pick, tree)

    new_params = fill(params, stats=False)
    new_stats = fill(batch_stats, stats=True)
    return new_params, new_stats, matched[0], skipped


def params_to_torch_state_dict(params, batch_stats, name_map) -> dict:
    """Inverse of convert(): our (params, batch_stats) trees -> a torch
    state_dict (conv HWIO->OIHW, dense (in,out)->(out,in), BN leaf renames).
    Bit-exact round-trip pinned by
    tests/test_convert_ckpt.py::test_inverse_converter_roundtrip. Accepts
    live jax trees or orbax-restored nested dicts. Powers `--to-torch`
    (migration back to the reference) and the twin cross-attacker
    evaluation (tools/twin_cross_eval.py)."""
    import jax
    import torch

    flat = {}
    for tree in (params, batch_stats):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            keys = tuple(getattr(p, "key", str(p)) for p in path)
            flat[keys] = np.asarray(leaf)

    def t(a):
        return torch.from_numpy(a.copy())

    sd = {}
    for tname, fpath in name_map.items():
        kernel = flat.get(fpath + ("kernel",))
        if kernel is not None:
            if kernel.ndim == 4:                     # conv: HWIO -> OIHW
                sd[tname + ".weight"] = t(np.ascontiguousarray(
                    kernel.transpose(3, 2, 0, 1)))
            else:                                    # dense: (in,out)->(out,in)
                w = np.ascontiguousarray(kernel.T)
                leaf = tname.rsplit(".", 1)[-1]
                if leaf in _FLATTEN_REMAP:           # undo the NHWC row remap
                    c, hh, ww = _FLATTEN_REMAP[leaf]
                    idx = np.arange(c * hh * ww)
                    ci, hi, wi = (idx // (hh * ww), (idx % (hh * ww)) // ww,
                                  idx % ww)
                    nhwc_pos = hi * (ww * c) + wi * c + ci
                    back = np.zeros_like(w)
                    back[:, idx] = w[:, nhwc_pos]
                    w = back
                sd[tname + ".weight"] = t(w)
            bias = flat.get(fpath + ("bias",))
            if bias is not None:
                sd[tname + ".bias"] = t(bias)
        elif fpath + ("scale",) in flat:             # batchnorm
            sd[tname + ".weight"] = t(flat[fpath + ("scale",)])
            sd[tname + ".bias"] = t(flat[fpath + ("bias",)])
            sd[tname + ".running_mean"] = t(flat[fpath + ("mean",)])
            sd[tname + ".running_var"] = t(flat[fpath + ("var",)])
    return sd


def name_map_for_arch(arch: str) -> dict:
    import re
    m = re.fullmatch(r"resnet(\d+).*", arch)
    if m:
        return resnet_name_map(int(m.group(1)), fd=arch.endswith("_fd"))
    if arch.startswith("PreActResNet"):
        return preact_name_map(18)
    if arch.startswith("Net2"):
        return mnist_name_map()
    raise SystemExit(f"no name map for arch {arch!r}")


def load_pretrained_torch(state, arch: str, path: str):
    """Warm-start `state` from a torchvision-format torch state_dict (the
    reference drivers' --pretrained: torchvision weights feed the backbone,
    the classifier head is re-initialized for the task's class count —
    ImageNet/experiments_imagenet.py:65-81,
    Tiny_ImageNet/experiments_tinyimagenet.py:60-70). Accepts a raw
    state_dict .pth or a reference-style {state_dict: ...} payload, with or
    without the DataParallel 'module.' prefix. Shape-mismatched heads are
    left at their fresh initialization. Returns (state, matched, skipped)."""
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload) \
        if isinstance(payload, dict) else payload
    state_dict = {k.removeprefix("module."): v for k, v in state_dict.items()}
    params, stats, n, skipped = convert(
        state_dict, name_map_for_arch(arch), state.params, state.batch_stats,
        on_mismatch="skip")
    return state.replace(params=params, batch_stats=stats), n, skipped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--arch", required=True)
    ap.add_argument("--num-classes", type=int, required=True)
    ap.add_argument("--cize", type=int, default=64)
    ap.add_argument("--r", type=int, default=8)
    ap.add_argument("--w", type=float, default=1.0)
    ap.add_argument("--low", type=float, default=38.0)
    ap.add_argument("--high", type=float, default=76.0)
    ap.add_argument("--alpha", type=float, default=0.0)
    ap.add_argument("--sigma", type=float, default=1.0)
    ap.add_argument("--type-canny", default="CannyFilter_step125_1")
    ap.add_argument("--epsilon", type=float, default=0.062745098)
    ap.add_argument("--n-queries", type=int, default=1)
    ap.add_argument("--dataset", default="Tiny-ImageNet",
                    help="PreActResNet only: picks the reference head "
                         "spelling for --to-torch exports ('linear' for "
                         "CIFAR*, 'fc' otherwise — preactresnet.py:103-111)")
    ap.add_argument("--to-torch", action="store_true",
                    help="reverse direction: ckpt is OUR orbax checkpoint "
                         "dir, out_dir is a .pth path; writes a reference"
                         "-format torch payload {epoch, arch, state_dict, "
                         "best_prec1} the reference drivers resume from "
                         "(utils/helper.py:58-61)")
    ap.add_argument("--which", default="best", choices=["best", "last"],
                    help="--to-torch: which orbax snapshot to export")
    args = ap.parse_args()

    import torch

    import jax
    # honor JAX_PLATFORMS even under the axon import hook, which rewrites
    # jax_platforms during `import jax` (see tests/conftest.py) — without
    # this, a JAX_PLATFORMS=cpu caller still lands on the TPU tunnel and
    # hangs/fails whenever the tunnel is down
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    if args.to_torch:
        from edge_enhancement_tpu.train import checkpoint as ckpt
        payload = ckpt.load_checkpoint(args.ckpt, which=args.which)
        if payload is None:
            raise SystemExit(f"no '{args.which}' checkpoint under "
                             f"{args.ckpt}")
        sd = params_to_torch_state_dict(payload["state"]["params"],
                                        payload["state"]["batch_stats"],
                                        name_map_for_arch(args.arch))
        if args.arch.startswith("PreActResNet"):
            # the preact name map aliases both torch head spellings to our
            # Dense_0 (forward conversion skips whichever is absent); the
            # export must emit exactly the one this dataset variant
            # declares, or the reference's strict resume rejects the file
            drop = ("fc" if args.dataset.startswith("CIFAR") else "linear")
            for k in (drop + ".weight", drop + ".bias"):
                sd.pop(k, None)
        meta = payload["meta"]
        out = args.out_dir
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        torch.save({"epoch": int(meta["epoch"]), "arch": args.arch,
                    "state_dict": sd,
                    "best_prec1": float(meta["best_prec1"])}, out)
        print(f"exported {len(sd)} tensors -> {out} "
              f"(epoch {meta['epoch']}, best_prec1 {meta['best_prec1']})")
        return
    payload = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload)
    # DataParallel prefix
    state_dict = {k.removeprefix("module."): v for k, v in state_dict.items()}

    import jax.numpy as jnp
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.train import checkpoint as ckpt
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import create_train_state

    margs = dict(r=args.r, w=args.w, gf=False, low=args.low, high=args.high,
                 alpha=args.alpha, sigma=args.sigma,
                 type_canny=args.type_canny, epsilon=args.epsilon,
                 n_queries=args.n_queries, cize=args.cize)
    ops = ModelOps(build_model(args.arch, margs, args.num_classes))
    channels = 1 if args.arch.startswith("Net2") else 3
    sample = jnp.zeros((1, args.cize, args.cize, channels), jnp.float32)
    state = create_train_state(ops, jax.random.PRNGKey(0), sample)

    import re
    m = re.fullmatch(r"resnet(\d+).*", args.arch)
    if m:
        name_map = resnet_name_map(int(m.group(1)),
                                   fd=args.arch.endswith("_fd"))
    elif args.arch.startswith("PreActResNet"):
        name_map = preact_name_map(18)
    elif args.arch.startswith("Net2"):
        name_map = mnist_name_map()
    else:
        raise SystemExit(f"no name map for arch {args.arch!r}")

    params, stats, n, _ = convert(state_dict, name_map, state.params,
                               state.batch_stats)
    state = state.replace(params=params, batch_stats=stats)
    ckpt.save_checkpoint(args.out_dir, jax.device_get(state),
                         int(payload.get("epoch", 0)),
                         args.arch, float(payload.get("best_prec1", 0.0)),
                         is_best=True)
    print(f"converted {n} tensors -> {args.out_dir} "
          f"(epoch {payload.get('epoch', 0)})")


if __name__ == "__main__":
    main()
