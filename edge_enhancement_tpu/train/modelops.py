"""Bridge between flax modules and the functional attack/objective layer.

The reference (torch) toggles `model.train()/eval()` mutable state; here the
two modes are explicit pure functions. Semantics reproduced exactly
(they matter for BN parity — SURVEY.md section 7 'hardest parts'):

* train mode: dropout active (fresh mask per forward), BatchNorm normalises
  with batch statistics AND updates running statistics — including on every
  forward inside a train-mode attack loop (the reference's PGD-in-train runs
  the DataParallel train-mode model, MNIST/experiments_mnist.py:227).
* eval mode: dropout off, BN uses running statistics, no mutation.
* the Add_Square defense layer draws fresh randomness in BOTH modes (torch
  `torch.rand` has no train/eval switch).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


class ModelOps:
    """Pure-functional train/eval forwards for a flax module.

    `batch_stats` may be an empty dict for stateless models (MNIST CNN); the
    same code paths then carry an empty pytree through jit at zero cost.
    """

    def __init__(self, model):
        self.model = model

    def _rngs(self, key: jax.Array) -> dict[str, jax.Array]:
        k_drop, k_square = jax.random.split(key)
        return {"dropout": k_drop, "square": k_square}

    def init(self, key: jax.Array, sample_x: jnp.ndarray):
        k_init, k_fwd = jax.random.split(key)
        variables = self.model.init({"params": k_init, **self._rngs(k_fwd)},
                                    sample_x, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return params, batch_stats

    def _variables(self, params, batch_stats):
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        return v

    def logits_train(self, params, batch_stats, x, key):
        """Train-mode forward; returns (logits, updated batch_stats)."""
        out = self.model.apply(self._variables(params, batch_stats), x,
                               train=True, rngs=self._rngs(key),
                               mutable=["batch_stats"] if batch_stats else [])
        if batch_stats:
            logits, mutated = out
            return logits, mutated["batch_stats"]
        logits, _ = out if isinstance(out, tuple) else (out, None)
        return logits, batch_stats

    def logits_eval(self, params, batch_stats, x, key):
        """Eval-mode forward (no mutation)."""
        return self.model.apply(self._variables(params, batch_stats), x,
                                train=False, rngs=self._rngs(key))


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  reduction: str = "mean") -> jnp.ndarray:
    """CE on integer labels, matching torch F.cross_entropy."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def soft_cross_entropy_sum(logits: jnp.ndarray, soft_targets: jnp.ndarray) -> jnp.ndarray:
    """-sum(log_softmax(logits) * targets) (AVmixup loss, attacks.py:462-464)."""
    return -jnp.sum(jax.nn.log_softmax(logits, axis=-1) * soft_targets)


def label_smooth_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      smoothing: float) -> jnp.ndarray:
    """LabelSmoothLoss (reference utils/attacks.py:89-99): weight
    (1-s) on the true class, s/(nclass-1) elsewhere, mean over batch."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    weight = jnp.full_like(logp, smoothing / (n - 1.0))
    one_hot = jax.nn.one_hot(labels, n, dtype=logits.dtype)
    weight = weight * (1.0 - one_hot) + one_hot * (1.0 - smoothing)
    return jnp.mean(jnp.sum(-weight * logp, axis=-1))


def kl_div_batchmean(log_q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """torch nn.KLDivLoss(reduction='batchmean')(log_q, p):
    sum(p * (log p - log_q)) / batch, with 0*log0 := 0."""
    logp = jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-38)), 0.0)
    return jnp.sum(p * (logp - log_q)) / log_q.shape[0]


def topk_accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ks=(1, 5)) -> dict[str, jnp.ndarray]:
    """top-k precision in percent (reference utils/helper.py:39-55).
    Soft-label targets are reduced with argmax, as in the reference."""
    if labels.ndim == 2:
        labels = jnp.argmax(labels, axis=-1)
    maxk = max(ks)
    _, pred = jax.lax.top_k(logits, maxk)
    correct = (pred == labels[:, None])
    out = {}
    for k in ks:
        out[f"top{k}"] = 100.0 * jnp.mean(jnp.any(correct[:, :k], axis=1).astype(jnp.float32))
    return out
