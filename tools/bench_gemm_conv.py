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
import functools
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
    ap.add_argument("--ib", type=int, nargs="+", default=None,
                    help="images_per_block candidates (default: per-shape "
                         "sweep bounded by the ~16 MB scoped-VMEM limit)")
    ap.add_argument("--shape", default=None,
                    help="substring filter on the shape label")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    print(f"backend: {jax.default_backend()}, dtype {dt}")

    from edge_enhancement_tpu.ops.pallas.gemm_conv import (conv_cgemm_flat,
                                                           pack_weights)

    native = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype))

    for label, b, h, w_, ci, co in SHAPES:
        if args.shape and args.shape not in label:
            continue
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, h, w_, ci)), dt)
        wk = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, dt)
        gf = 2 * b * h * w_ * ci * co * 9 / 1e9
        tn = timeit(native, x, wk, args.reps)
        print(f"{label}: native {tn*1e3:.3f} ms ({gf/tn:.0f} GFLOP/s)")

        # ib sweep bounded so the block (cin x ib*h*w bf16; measured ~7
        # live copies on the shift/concat stack — Mosaic reported 20.9M for
        # a 2.1M block) stays under the 16 MB scoped VMEM
        cands = args.ib or [ib for ib in (1, 2, 4, 8, 16)
                            if ib <= b and ci * ib * h * w_ * 2 * 7 < 14e6]
        for ib in cands:
            pallas = jax.jit(functools.partial(conv_cgemm_nhwc,
                                               images_per_block=ib))
            d = jnp.max(jnp.abs(native(x, wk).astype(jnp.float32)
                                - pallas(x, wk).astype(jnp.float32)))
            tp = timeit(pallas, x, wk, args.reps)
            # kernel-only: chain in the flat channel-major layout (cin==cout
            # here), charging NO boundary transposes — isolates the kernel
            # itself from its NHWC integration cost
            wf = pack_weights(wk).astype(dt)
            flat = jax.jit(lambda xf, wf_, _ib=ib: conv_cgemm_flat(
                xf, wf_, H=h, W=w_, images_per_block=_ib))
            xf = jnp.transpose(x, (3, 0, 1, 2)).reshape(ci, b * h * w_)
            tf_ = timeit(flat, xf, wf, args.reps)
            print(f"  cgemm ib={ib}: nhwc {tp*1e3:.3f} ms "
                  f"({gf/tp:.0f} GFLOP/s, {tn/tp:.2f}x) | flat-kernel-only "
                  f"{tf_*1e3:.3f} ms ({gf/tf_:.0f} GFLOP/s, {tn/tf_:.2f}x) "
                  f"| maxdiff {float(d):.2e}")


if __name__ == "__main__":
    main()
