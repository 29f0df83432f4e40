#!/usr/bin/env python
"""R50@224 conv-efficiency sweep: compile the fused PGD-10 AT step under
candidate TPU compiler options (passed per-compile via AOT
`.lower().compile(compiler_options=...)` — XLA_FLAGS does not reach the
remote compiler on this platform) and time each executable.

    python tools/bench_sweep.py            # full sweep (many remote compiles!)
    EE_SWEEP_ONLY=vmem64,base python tools/bench_sweep.py

Prints one JSON line per experiment. Each distinct option set is a fresh
multi-minute remote compile; the jax persistent cache covers repeats.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

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

# name -> (compiler_options, batch_size)
EXPERIMENTS = {
    "base": ({}, 128),
    "vmem32": ({"xla_tpu_scoped_vmem_limit_kib": "32768"}, 128),
    "vmem64": ({"xla_tpu_scoped_vmem_limit_kib": "65536"}, 128),
    "no_rwb": ({"xla_tpu_rwb_fusion": "false"}, 128),
    "sched_rerun": ({"xla_latency_hiding_scheduler_rerun": "3"}, 128),
    "licm2": ({"xla_tpu_licm_size_inflation_ratio": "2"}, 128),
    "bs192": ({}, 192),
    "bs160": ({}, 160),
    "vmem64_bs192": ({"xla_tpu_scoped_vmem_limit_kib": "65536"}, 192),
}


def build(batch_size):
    spec = SPECS["imagenet"]
    args = dict(r=16, w=1.0, gf=False, low=38.0, high=76.0, alpha=0.0,
                sigma=1.0, type_canny="CannyFilter_step125_1",
                epsilon=0.062745098039216, n_queries=1, cize=224,
                dtype="bfloat16")
    ops = ModelOps(build_model("resnet50_EE", args, spec.num_classes))
    mesh = meshlib.make_mesh()
    mcfg = MethodConfig(method_name="EE_BPDA3_AT_square",
                        epsilon=0.062745098039216, num_steps=10,
                        step_size=0.007843137254902,
                        num_classes=spec.num_classes, attack_unroll=1)
    step = build_train_step(ops, mcfg, OptimConfig(0.9, 2e-4), mesh=mesh,
                            donate=True)
    ds = synthetic_dataset(spec, batch_size, seed=0)
    x, y = next(ds.batches(batch_size, shuffle=False, seed=0))
    state = create_train_state(ops, jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    state = meshlib.replicate(mesh, state)
    xb, yb = meshlib.shard_batch(mesh, (x, y))
    return step, state, xb, yb


def run_one(name, options, batch_size):
    step, state, xb, yb = build(batch_size)
    key = jax.random.PRNGKey(1)
    lr = jnp.float32(0.1)
    t0 = time.perf_counter()
    lowered = step.lower(state, xb, yb, key, lr)
    compiled = lowered.compile(compiler_options=options or None)
    compile_s = time.perf_counter() - t0
    # donated input: keep feeding the returned state back
    state, m = compiled(state, xb, yb, key, lr)
    float(jax.device_get(m["loss"]))           # true sync (axon)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            key, k = jax.random.split(key)
            state, m = compiled(state, xb, yb, k, lr)
        float(jax.device_get(m["loss"]))
        times.append((time.perf_counter() - t0) / 5)
    dt = sorted(times)[1]
    print(json.dumps({"exp": name, "bs": batch_size,
                      "img_per_sec": round(batch_size / dt, 1),
                      "step_ms": round(dt * 1e3, 1),
                      "compile_s": round(compile_s, 1),
                      "options": options}), flush=True)


def main():
    only = os.environ.get("EE_SWEEP_ONLY")
    names = ([n.strip() for n in only.split(",")] if only
             else list(EXPERIMENTS))
    for name in names:
        options, bs = EXPERIMENTS[name]
        try:
            run_one(name, options, bs)
        except Exception as e:  # unknown option -> remote compile 500
            print(json.dumps({"exp": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
