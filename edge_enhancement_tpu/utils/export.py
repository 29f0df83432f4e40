"""Serving export: serialize the eval forward pass to a StableHLO artifact.

The reference deploys models by shipping torch checkpoints and re-importing
the Python model zoo at inference time. Here the whole eval forward
(EE front-end + backbone, weights baked in as constants) is exported through
`jax.export` into one self-contained StableHLO artifact that any JAX
process — CPU, TPU, or a C++ PJRT runtime — can deserialize and run WITHOUT
the model zoo, the config system, or the checkpoint format.

The exported callable has signature (x, seed) -> logits:
    x:    float32 [batch, H, W, C] pixels in [0, 1]
    seed: uint32 scalar driving the stochastic defense layers (Add_Square);
          pass any constant for deterministic serving.

The batch dimension is exported symbolically when the model's ops allow it
(all shipped models do), so one artifact serves any batch size.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import export as jexport


def make_serving_fn(ops, params, batch_stats) -> Callable:
    """Eval forward with weights closed over: (x, seed) -> logits."""

    def serve(x, seed):
        key = jax.random.PRNGKey(seed)
        return ops.logits_eval(params, batch_stats, x, key)

    return serve


def export_serving(ops, params, batch_stats, image_size: int, channels: int,
                   batch: Optional[int] = None) -> jexport.Exported:
    """Export the eval forward. `batch=None` exports a symbolic batch
    dimension (one artifact, any batch size); an int pins it."""
    serve = make_serving_fn(ops, params, batch_stats)
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, image_size, image_size, channels),
                                      jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct((batch, image_size, image_size, channels),
                                      jnp.float32)
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)
    # lower for both host and TPU so one artifact serves everywhere
    return jexport.export(jax.jit(serve),
                          platforms=("cpu", "tpu"))(x_spec, seed_spec)


def save_serving_artifact(path: str, ops, params, batch_stats,
                          image_size: int, channels: int,
                          batch: Optional[int] = None) -> None:
    exp = export_serving(ops, params, batch_stats, image_size, channels,
                         batch=batch)
    with open(path, "wb") as f:
        f.write(exp.serialize())


def load_serving_artifact(path: str) -> Callable:
    """Deserialize an artifact into a callable (x, seed) -> logits.
    Needs only jax — no model zoo / checkpoint imports."""
    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return lambda x, seed: exp.call(jnp.asarray(x, jnp.float32),
                                    jnp.uint32(seed))
