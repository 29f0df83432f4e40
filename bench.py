#!/usr/bin/env python
"""Headline benchmark: Tiny-ImageNet ResNet18_EE_square PGD-10 adversarial
training throughput (the reference's recorded workload — BASELINE.md:
~130 img/s on its GPU at bs=100, including the PGD-10 inner loop).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax.devices() provides (the real TPU chip under axon).
"""

import json
import os
import subprocess
import sys
import time


def _wait_for_backend(max_wait_s: float = 900.0, probe_timeout: float = 420.0):
    """The axon TPU tunnel is occasionally down for a few minutes (round-4's
    recorded bench failed on a transient UNAVAILABLE). Probe jax.devices()
    in a SUBPROCESS — jax caches a failed backend discovery in-process — and
    only give up after max_wait_s."""
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return
            err = r.stderr.decode(errors="replace").strip().splitlines()
            err = err[-1] if err else "unknown"
        except subprocess.TimeoutExpired:
            err = f"probe timed out after {probe_timeout:.0f}s"
        if time.monotonic() > deadline:
            print(f"bench: backend still unavailable after {max_wait_s:.0f}s "
                  f"({err})", file=sys.stderr)
            return  # fall through: the real error surfaces in main()
        print(f"bench: backend unavailable (attempt {attempt}: {err}); "
              "retrying in 60s", file=sys.stderr)
        time.sleep(60)


_wait_for_backend(float(os.environ.get("EE_BENCH_BACKEND_WAIT", 900)))

import jax

# Persistent compilation cache: remote TPU compiles of the fused PGD-10 step
# take minutes; cache them across bench invocations.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/ee_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from edge_enhancement_tpu.data.datasets import SPECS, synthetic_dataset
from edge_enhancement_tpu.models.registry import build_model
from edge_enhancement_tpu.objectives.methods import MethodConfig
from edge_enhancement_tpu.parallel import mesh as meshlib
from edge_enhancement_tpu.train.modelops import ModelOps
from edge_enhancement_tpu.train.trainer import (OptimConfig, build_train_step,
                                                create_train_state)

REFERENCE_IMG_PER_SEC = 130.0  # BASELINE.md: ~0.73-0.80 s/iter @ bs100


def main():
    # EE_BENCH_WORKLOAD=imagenet_r50 switches to the BASELINE.json north-star
    # workload (ResNet50_EE @224 PGD-10); default is the reference's recorded
    # TinyIN ResNet18_EE_square workload.
    workload = os.environ.get("EE_BENCH_WORKLOAD", "tinyin_r18")
    if workload == "imagenet_r50":
        # bs sweep (bf16, rolled loop): 32 -> 260.7, 64 -> 249.9,
        # 128 -> 286.3, 256 -> 274.4 img/s (docs/PERF.md)
        batch_size = int(os.environ.get("EE_BENCH_BATCH", 128))
        spec = SPECS["imagenet"]
        arch = "resnet50_EE"
        metric = "imagenet_resnet50_ee_pgd10_at_throughput"
        args = dict(r=16, w=1.0, gf=False, low=38.0, high=76.0, alpha=0.0,
                    sigma=1.0, type_canny="CannyFilter_step125_1",
                    epsilon=0.062745098039216, n_queries=1, cize=224)
    else:
        batch_size = int(os.environ.get("EE_BENCH_BATCH", 100))
        spec = SPECS["tiny_imagenet"]
        arch = "resnet18_EE_square"
        metric = "tinyin_resnet18_ee_bpda3_pgd10_at_throughput"
        args = dict(r=8, w=1.0, gf=False, low=38.0, high=76.0, alpha=0.0,
                    sigma=1.0, type_canny="CannyFilter_step125_1",
                    epsilon=0.062745098039216, n_queries=1, cize=64)
    # optional fast modes (headline stays the f32 parity workload):
    #   EE_BENCH_DTYPE=bfloat16  -> mixed precision (~+20%)
    #   EE_BENCH_FUSED=1         -> pallas fused canny front-end
    if os.environ.get("EE_BENCH_DTYPE"):
        args["dtype"] = os.environ["EE_BENCH_DTYPE"]
    if os.environ.get("EE_BENCH_FUSED"):
        args["fused_canny"] = True
    if os.environ.get("EE_BENCH_REMAT"):
        args["remat_ee"] = True
    model = build_model(arch, args, spec.num_classes)
    ops = ModelOps(model)
    mesh = meshlib.make_mesh()

    mcfg = MethodConfig(method_name="EE_BPDA3_AT_square",
                        epsilon=0.062745098039216, num_steps=10,
                        step_size=0.007843137254902,
                        num_classes=spec.num_classes,
                        # rolled attack loop wins at 224x224 (docs/PERF.md)
                        attack_unroll=1 if workload == "imagenet_r50" else None)
    opt = OptimConfig(momentum=0.9, weight_decay=2e-4)
    # device-side multi-step loop (train.py steps_per_dispatch): K steps per
    # dispatch — identical math, 1/K of the ~7 ms/launch remote-dispatch
    # overhead (docs/PERF.md). EE_BENCH_CHAIN=1 restores per-step dispatch.
    # 40 amortizes the ~7 ms launch into the 12-ms TinyIN step; the 224px
    # R50 step is ~250 ms, so chaining buys nothing and a deep 224px input
    # stack just wastes HBM.
    chain = int(os.environ.get("EE_BENCH_CHAIN",
                               40 if workload != "imagenet_r50" else 1))
    if chain > 1:
        from edge_enhancement_tpu.train.trainer import \
            build_chained_train_step
        step = build_chained_train_step(ops, mcfg, opt, mesh=mesh,
                                        donate=True)
    else:
        step = build_train_step(ops, mcfg, opt, mesh=mesh, donate=True)

    ds = synthetic_dataset(spec, batch_size * 2, seed=0)
    x, y = next(ds.batches(batch_size, shuffle=False, seed=0))
    state = create_train_state(ops, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]))
    state = meshlib.replicate(mesh, state)
    lr = jnp.float32(0.1)
    key = jax.random.PRNGKey(1)
    if chain > 1:
        xs = np.broadcast_to(x, (chain,) + x.shape).copy()
        ys = np.broadcast_to(y, (chain,) + y.shape).copy()
        xb, yb = meshlib.shard_batch_stacked(mesh, (xs, ys))

        def run_once(state, key):
            key, k = jax.random.split(key)
            keys = jax.random.split(k, chain)
            state, m = step(state, xb, yb, keys, lr)
            return state, m, key
    else:
        xb, yb = meshlib.shard_batch(mesh, (x, y))

        def run_once(state, key):
            key, k = jax.random.split(key)
            state, m = step(state, xb, yb, k, lr)
            return state, m, key

    # Warmup with a REAL host transfer: on the experimental axon platform
    # block_until_ready returns early — only device_get truly synchronises
    # (it also absorbs the hidden remote first-execution compile).
    state, m, key = run_once(state, key)
    float(jax.device_get(m["loss"]))

    # Timed segments, each ended by a true device_get sync.
    seg, n_segs, times = 5, 3, []
    for _ in range(n_segs):
        t0 = time.perf_counter()
        for _ in range(seg):
            state, m, key = run_once(state, key)
        float(jax.device_get(m["loss"]))
        times.append((time.perf_counter() - t0) / (seg * chain))
    dt = sorted(times)[len(times) // 2]

    img_per_sec = batch_size / dt
    print(json.dumps({
        "metric": metric,
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 3),
    }))


def _retry_exec(exc: BaseException):
    """A transient tunnel drop AFTER the probe succeeded leaves jax with a
    cached dead backend in-process — the only clean retry is a re-exec.
    Bounded by EE_BENCH_EXEC_ATTEMPT so a hard outage still terminates."""
    attempt = int(os.environ.get("EE_BENCH_EXEC_ATTEMPT", 0))
    if attempt >= 2 or "UNAVAILABLE" not in str(exc):
        raise exc
    print(f"bench: run failed with a transient backend error ({exc}); "
          f"re-executing (attempt {attempt + 1})", file=sys.stderr)
    time.sleep(60)
    os.environ["EE_BENCH_EXEC_ATTEMPT"] = str(attempt + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — transient-backend filter inside
        _retry_exec(e)
