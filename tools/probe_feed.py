"""Attribute the end-to-end training-throughput gap on remote-dispatch hosts.

The dress rehearsal (docs/REHEARSAL.md) ran the flagship step at ~2.6 s per
40-step dispatch while the device-only headline (bench.py) implies ~0.5 s of
compute — the other ~2 s is the host side of the feed (stack assembly,
host->device transfer over the TPU tunnel, metric sync). This probe runs the
REAL chained train step on the real flagship shapes and times each phase,
then A/Bs the current serial loop against a one-deep prefetch (device_put of
stack k+1 issued before the sync on stack k), which is the candidate fix.

    python tools/probe_feed.py --dispatches 8 --spd 40 [--size 20000]

Prints one JSON line per variant: {"variant": ..., "img_per_s": ...,
"phase_ms": {stack, put, call, sync}}.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="edge_enhancement_tpu/configs/"
                    "tiny_imagenet/ee_at_bpda3_square.yml")
    ap.add_argument("--size", type=int, default=0,
                    help="synthetic-hard train size (default: sized to the "
                         "dispatch count)")
    ap.add_argument("--spd", type=int, default=40)
    ap.add_argument("--dispatches", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from edge_enhancement_tpu.utils.config import apply_platform, load_config
    cfg = load_config(args.config, {"platform": args.platform})
    apply_platform(cfg)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from edge_enhancement_tpu.data.datasets import get_dataset
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.parallel import mesh as meshlib
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import (OptimConfig,
                                                    build_chained_train_step,
                                                    create_train_state)
    from train import make_method_config

    bs = int(cfg["batch_size"])
    need = (args.dispatches + 1) * args.spd * bs
    train_ds, spec = get_dataset(cfg["dataset"], "synthetic-hard", train=True,
                                 synthetic_size=(args.size or need))
    model = build_model(cfg["arch"], cfg, spec.num_classes)
    ops = ModelOps(model)
    mesh = meshlib.make_mesh()
    sample_x, _ = next(train_ds.batches(2, shuffle=False, seed=0))
    state = create_train_state(ops, jax.random.PRNGKey(1),
                               jnp.asarray(sample_x[:1]))
    state = meshlib.replicate(mesh, state)
    mcfg = make_method_config(cfg, spec.num_classes)
    opt = OptimConfig(momentum=float(cfg.get("momentum", 0.9)),
                      weight_decay=float(cfg.get("weight_decay", 0.0)))
    # donate=False so the same state can warm both variants
    step = build_chained_train_step(ops, mcfg, opt, mesh=mesh, donate=False)

    def stacks(n):
        """n [spd, bs, ...] uint8 host stacks from the real pipeline."""
        out, pend = [], []
        it = train_ds.batches(bs, shuffle=True, seed=1, epoch=0, as_uint8=True)
        for x, y in it:
            pend.append((x, y))
            if len(pend) == args.spd:
                out.append((np.stack([b[0] for b in pend]),
                            np.stack([b[1] for b in pend])))
                pend.clear()
                if len(out) == n:
                    break
        return out

    key = jax.random.PRNGKey(0)
    data = stacks(args.dispatches + 1)
    keys = []
    for _ in range(len(data)):
        key, k = jax.random.split(key)
        keys.append(jax.random.split(k, args.spd))
    lr = jnp.float32(0.1)

    # warm-up: one dispatch, truly synced (absorbs remote compile)
    xb, yb = meshlib.shard_batch_stacked(mesh, data[0])
    st, metrics = step(state, xb, yb, keys[0], lr)
    jax.device_get(metrics)
    print(f"warmed up ({jax.devices()[0].platform})", file=sys.stderr)

    def run_serial():
        ph = {"stack": 0.0, "put": 0.0, "call": 0.0, "sync": 0.0}
        t0 = time.time()
        for i in range(1, args.dispatches + 1):
            t = time.time()
            xb, yb = meshlib.shard_batch_stacked(mesh, data[i])
            ph["put"] += time.time() - t
            t = time.time()
            _, m = step(state, xb, yb, keys[i], lr)
            ph["call"] += time.time() - t
            t = time.time()
            jax.device_get(m)          # the per-print metric sync
            ph["sync"] += time.time() - t
        return time.time() - t0, ph

    def run_prefetch():
        ph = {"stack": 0.0, "put": 0.0, "call": 0.0, "sync": 0.0}
        t0 = time.time()
        t = time.time()
        staged = meshlib.shard_batch_stacked(mesh, data[1])
        ph["put"] += time.time() - t
        last_m = None
        for i in range(1, args.dispatches + 1):
            t = time.time()
            _, m = step(state, staged[0], staged[1], keys[i], lr)
            ph["call"] += time.time() - t
            if i < args.dispatches:
                t = time.time()
                staged = meshlib.shard_batch_stacked(mesh, data[i + 1])
                ph["put"] += time.time() - t
            if last_m is not None:
                t = time.time()
                jax.device_get(last_m)   # sync one dispatch behind
                ph["sync"] += time.time() - t
            last_m = m
        t = time.time()
        jax.device_get(last_m)
        ph["sync"] += time.time() - t
        return time.time() - t0, ph

    imgs = args.dispatches * args.spd * bs
    for name, fn in (("serial", run_serial), ("prefetch", run_prefetch),
                     ("serial2", run_serial), ("prefetch2", run_prefetch)):
        wall, ph = fn()
        print(json.dumps({
            "variant": name, "img_per_s": round(imgs / wall, 1),
            "wall_s": round(wall, 3),
            "phase_ms_per_dispatch": {k: round(v / args.dispatches * 1e3, 1)
                                      for k, v in ph.items()}}))


if __name__ == "__main__":
    main()
