#!/usr/bin/env python
"""Microbenchmark: native stride-2 conv dgrad vs the phase-decomposed one.

Times fwd+input-gradient over the four strided convolutions of R50@224
(bs128, bf16) — the layers the round-2 profile blames for the ~29% MXU
occupancy of the 224px step. Two jitted programs total (one per variant);
the forward paths are identical, so the variant delta is the dgrad delta.

    python tools/bench_dgrad.py
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
from jax import lax

from edge_enhancement_tpu.ops.phase_dgrad import _DN, conv2d_s2

# (name, x-shape NHWC, kernel HWIO, pad)
SHAPES = [
    ("l2_3x3", (128, 56, 56, 128), (3, 3, 128, 128), 1),
    ("l2_proj", (128, 56, 56, 256), (1, 1, 256, 512), 0),
    ("l3_3x3", (128, 28, 28, 256), (3, 3, 256, 256), 1),
    ("l4_3x3", (128, 14, 14, 512), (3, 3, 512, 512), 1),
]


def make_fn(variant):
    def fn(xs, ks, ws):
        tot = jnp.float32(0)
        grads = []
        for (name, _, _, pad), x, k, w in zip(SHAPES, xs, ks, ws):
            P = ((pad, pad), (pad, pad))
            if variant == "phase":
                def loss(x_, k=k, w=w, P=P):
                    return (conv2d_s2(x_, k, P).astype(jnp.float32) * w).sum()
            else:
                def loss(x_, k=k, w=w, P=P):
                    y = lax.conv_general_dilated(
                        x_, k, (2, 2), P, dimension_numbers=_DN,
                        preferred_element_type=x_.dtype)
                    return (y.astype(jnp.float32) * w).sum()
            val, dx = jax.value_and_grad(loss)(x)
            tot = tot + val
            grads.append(dx.astype(jnp.float32).mean())
        return tot, jnp.stack(grads)
    return jax.jit(fn)


def main():
    rng = np.random.RandomState(0)
    xs, ks, ws = [], [], []
    for name, xs_, ks_, pad in SHAPES:
        xs.append(jnp.asarray(rng.randn(*xs_).astype(np.float32),
                              dtype=jnp.bfloat16))
        ks.append(jnp.asarray(
            (rng.randn(*ks_) / np.sqrt(np.prod(ks_[:3]))).astype(np.float32),
            dtype=jnp.bfloat16))
        oh, ow = xs_[1] // 2, xs_[2] // 2
        ws.append(jnp.asarray(rng.randn(xs_[0], oh, ow, ks_[3])
                              .astype(np.float32)))
    out = {}
    for variant in ("native", "phase"):
        fn = make_fn(variant)
        t0 = time.perf_counter()
        tot, grads = fn(xs, ks, ws)
        g0 = jax.device_get(grads)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(10):
                tot, grads = fn(xs, ks, ws)
            jax.device_get(tot)
            times.append((time.perf_counter() - t0) / 10)
        dt = sorted(times)[2]
        out[variant] = {"ms": round(dt * 1e3, 3),
                        "compile_s": round(compile_s, 1),
                        "grad_means": [round(float(v), 6) for v in g0]}
        print(json.dumps({"variant": variant, **out[variant]}), flush=True)
    if "native" in out and "phase" in out:
        print(json.dumps({
            "speedup_pct": round(100 * (out["native"]["ms"] /
                                        out["phase"]["ms"] - 1), 1),
            "grads_match": bool(np.allclose(out["native"]["grad_means"],
                                            out["phase"]["grad_means"],
                                            rtol=0.02, atol=1e-4))}),
            flush=True)


if __name__ == "__main__":
    main()
