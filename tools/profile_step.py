#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship PGD-10 train step and print
the top device ops by total duration (parses the trace.json.gz directly —
no TensorBoard needed).

    python tools/profile_step.py [out_dir]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def capture(out_dir: str):
    from edge_enhancement_tpu.data.datasets import SPECS, synthetic_dataset
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.objectives.methods import MethodConfig
    from edge_enhancement_tpu.parallel import mesh as meshlib
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import (OptimConfig,
                                                    build_train_step,
                                                    create_train_state)

    batch = int(os.environ.get("EE_PROF_BATCH", 100))
    arch = os.environ.get("EE_PROF_ARCH", "resnet18_EE_square")
    cize = int(os.environ.get("EE_PROF_CIZE", 64))
    spec = SPECS["imagenet" if cize > 64 else "tiny_imagenet"]
    args = dict(r=8 if cize <= 64 else 16, w=1.0, gf=False, low=38.0,
                high=76.0, alpha=0.0, sigma=1.0,
                type_canny="CannyFilter_step125_1",
                epsilon=0.0627, n_queries=1, cize=cize)
    if os.environ.get("EE_PROF_DTYPE"):
        args["dtype"] = os.environ["EE_PROF_DTYPE"]
    if os.environ.get("EE_PROF_FUSED"):
        args["fused_canny"] = True
    ops = ModelOps(build_model(arch, args, spec.num_classes))
    mesh = meshlib.make_mesh()
    ds = synthetic_dataset(spec, batch, seed=0)
    x, y = next(ds.batches(batch, shuffle=False, seed=0))
    state = create_train_state(ops, jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    mcfg = MethodConfig(method_name="EE_BPDA3_AT_square", epsilon=0.0627,
                        num_steps=10, step_size=0.0078,
                        num_classes=spec.num_classes)
    step = build_train_step(ops, mcfg, OptimConfig(0.9, 2e-4), mesh=mesh)
    st = meshlib.replicate(mesh, state)
    xb, yb = meshlib.shard_batch(mesh, (x, y))
    key = jax.random.PRNGKey(1)
    st, m = step(st, xb, yb, key, jnp.float32(0.1))
    float(jax.device_get(m["loss"]))  # real sync (axon: block_until_ready lies)

    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        key, k = jax.random.split(key)
        st, m = step(st, xb, yb, k, jnp.float32(0.1))
    float(jax.device_get(m["loss"]))
    jax.profiler.stop_trace()


def summarize(out_dir: str, top: int = 25):
    traces = sorted(glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True))
    if not traces:
        print("no trace files under", out_dir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    durations = defaultdict(float)
    counts = defaultdict(int)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        durations[name] += ev.get("dur", 0)
        counts[name] += 1
    total = sum(durations.values())
    print(f"total device time: {total/1e3:.2f} ms over {len(durations)} op names")
    for name, dur in sorted(durations.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3:9.2f} ms  x{counts[name]:<5d} {name[:90]}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ee_profile"
    capture(out)
    summarize(out)
