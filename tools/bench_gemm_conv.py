#!/usr/bin/env python
"""Microbenchmark: channels-on-contraction Pallas GEMM-conv vs XLA's native
NHWC conv on the profiled half-MXU shapes (docs/PERF.md structural ceiling
item 1: 64-channel convs cap at ~50% MXU under the native lowering).

The Pallas timing INCLUDES the NHWC<->channel-major boundary transposes, so
a win here is an integrable win. Timing protocol per CLAUDE.md: device_get
warm-up (absorbs the remote compile), device_get at the end of every timed
segment.

    python tools/bench_gemm_conv.py [--reps 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from edge_enhancement_tpu.ops.pallas.gemm_conv import conv_cgemm_nhwc

# (label, B, H, W, Cin, Cout): the 64-channel layers that drag the MXU
SHAPES = [
    ("tinyin_l1 bs512 16x16 64->64", 512, 16, 16, 64, 64),
    ("tinyin_stemout bs512 32x32 64->64", 512, 32, 32, 64, 64),
    ("r50_l1 bs128 56x56 64->64", 128, 56, 56, 64, 64),
]


def timeit(fn, x, w, reps, outer=3):
    """Chain `reps` applications on-device in ONE dispatch (output feeds
    input — these SAME 64->64 convs preserve shape), so the ~7 ms/launch
    remote-tunnel dispatch cost (CLAUDE.md) cannot bury the kernel. The
    chain is data-dependent, so XLA must execute every iteration; tanh
    keeps the chained activations bounded."""
    import jax.numpy as jnp

    # scalar result: the fetch that closes each timed segment moves 4 bytes,
    # not the 64 MB activation, over the ~34 MB/s tunnel
    chained = jax.jit(lambda xx, ww: jnp.sum(jax.lax.fori_loop(
        0, reps, lambda i, a: jnp.tanh(fn(a, ww)), xx).astype(jnp.float32)))
    jax.device_get(chained(x, w))   # compile + first-run sync
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        jax.device_get(chained(x, w))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--images-per-block", type=int, default=8)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    print(f"backend: {jax.default_backend()}, dtype {dt}")

    native = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype))
    pallas = jax.jit(lambda x, w: conv_cgemm_nhwc(
        x, w, images_per_block=args.images_per_block))

    for label, b, h, w_, ci, co in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, h, w_, ci)), dt)
        wk = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, dt)
        # correctness spot-check on-device
        d = jnp.max(jnp.abs(native(x, wk).astype(jnp.float32)
                            - pallas(x, wk).astype(jnp.float32)))
        gf = 2 * b * h * w_ * ci * co * 9 / 1e9
        tn = timeit(native, x, wk, args.reps)
        tp = timeit(pallas, x, wk, args.reps)
        print(f"{label}: native {tn*1e3:.3f} ms ({gf/tn:.0f} GFLOP/s) | "
              f"cgemm {tp*1e3:.3f} ms ({gf/tp:.0f} GFLOP/s) | "
              f"speedup {tn/tp:.2f}x | maxdiff {float(d):.2e}")


if __name__ == "__main__":
    main()
