"""Adversarial Weight Perturbation (AWP) training step.

Parity target: AWP/*/models_*/utils_awp.py:8-55 + the driver step
(experiments_tiny_awp.py:255-286):

  1. x_adv = 10-step train-mode PGD.
  2. proxy = params; one plain-SGD (lr 0.01, no momentum) ascent step on
     CE(proxy(x_adv), y)  (loss = -CE minimised).
  3. diff (per conv/linear KERNEL only — tensors with ndim > 1):
     (||w|| / (||w' - w|| + 1e-20)) * (w' - w), full-tensor L2 norms.
  4. robust loss/gradients evaluated at w + gamma * diff; the SGD update is
     applied around the unperturbed w (perturb -> step -> restore collapses
     to exactly this in functional form — no proxy-net mutation needed).

The proxy's BN-stat updates are discarded (the reference's proxy is thrown
away); the perturbed robust forward updates the real BN stats.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..attacks.pgd import PGDConfig, pgd_linf
from ..parallel import mesh as meshlib
from ..train.modelops import ModelOps, cross_entropy, topk_accuracy
from ..train.sgd import sgd_update
from ..train.trainer import OptimConfig, TrainState, to_float_pixels
from .methods import MethodConfig, _unroll

_EPS = 1e-20


@dataclasses.dataclass(frozen=True)
class AWPConfig:
    gamma: float = 0.005
    warmup: int = 0          # epochs before AWP kicks in (awp_warmup)
    proxy_lr: float = 0.01   # proxy SGD lr (experiments_tiny_awp.py:118)
    l1: float = 0.0          # optional L1 regulariser (cifar100 driver)


def _is_kernel(path_leaf_name: str, leaf: jnp.ndarray) -> bool:
    """'weight' in name and ndim > 1 in torch == flax 'kernel' leaves with
    ndim > 1 (biases and BN scales are 1-D and excluded either way)."""
    return leaf.ndim > 1 and path_leaf_name == "kernel"


def _awp_diff(params: Any, proxy_params: Any) -> Any:
    """Per-kernel normalised weight diff; zeros elsewhere."""
    def diff_leaf(path, w, w_new):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if not _is_kernel(name, w):
            return jnp.zeros_like(w)
        d = w_new - w
        return (jnp.linalg.norm(w.reshape(-1)) /
                (jnp.linalg.norm(d.reshape(-1)) + _EPS)) * d

    return jax.tree_util.tree_map_with_path(diff_leaf, params, proxy_params)


def build_awp_train_step(ops: ModelOps, method: MethodConfig, opt: OptimConfig,
                         awp: AWPConfig, mesh=None, donate: bool = False):
    """Jitted step(state, x, y, key, lr, awp_on) -> (state, metrics).
    `awp_on` (traced bool/float) implements the warmup gate without
    recompiling per epoch."""

    def attack_loss(params, labels):
        def loss_fn(x, batch_stats, key):
            logits, bs = ops.logits_train(params, batch_stats, x, key)
            return cross_entropy(logits, labels, "sum"), bs
        return loss_fn

    def step_fn(state: TrainState, x, y, key, lr, awp_on):
        x = to_float_pixels(x)
        key_atk, key_proxy, key_fwd = jax.random.split(key, 3)
        sg_params = jax.lax.stop_gradient(state.params)

        pcfg = PGDConfig(method.epsilon, method.num_steps, method.step_size,
                         random_init=("uniform" if method.random else "none"),
                         unroll=_unroll(method.num_steps, method.attack_unroll))
        x_adv, bs = pgd_linf(attack_loss(sg_params, y), x, key_atk, pcfg,
                             aux=state.batch_stats)
        x_adv = jax.lax.stop_gradient(x_adv)

        # proxy ascent step (BN-stat updates discarded)
        def proxy_ce(p):
            logits, _ = ops.logits_train(p, bs, x_adv, key_proxy)
            return cross_entropy(logits, y, "mean")

        g_proxy = jax.grad(proxy_ce)(sg_params)
        proxy_params = jax.tree.map(lambda w, g: w + awp.proxy_lr * g,
                                    sg_params, g_proxy)
        diff = _awp_diff(sg_params, proxy_params)
        scale = awp.gamma * awp_on  # warmup gate: awp_on in {0.0, 1.0}

        def robust_loss(p):
            p_pert = jax.tree.map(lambda w, d: w + scale * d, p, diff)
            logits, bs2 = ops.logits_train(p_pert, bs, x_adv, key_fwd)
            loss = cross_entropy(logits, y, "mean")
            if awp.l1 > 0:
                l1 = sum(jnp.abs(w).sum()
                         for w in jax.tree.leaves(p_pert)
                         if w.ndim > 1)
                loss = loss + awp.l1 * l1
            return loss, (bs2, logits)

        (loss, (bs2, logits)), grads = jax.value_and_grad(
            robust_loss, has_aux=True)(state.params)
        # torch's optimizer.step runs on the PERTURBED weights, so its coupled
        # weight decay sees w + scale*diff; fold the extra wd*scale*diff in.
        if opt.weight_decay:
            grads = jax.tree.map(lambda g, d: g + opt.weight_decay * scale * d,
                                 grads, diff)
        new_params, new_buf = sgd_update(state.params, grads, state.momentum_buf,
                                         lr=lr, momentum=opt.momentum,
                                         weight_decay=opt.weight_decay)
        new_state = TrainState(params=new_params, batch_stats=bs2,
                               momentum_buf=new_buf, step=state.step + 1)
        return new_state, {"loss": loss, **topk_accuracy(logits, y)}

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        return jax.jit(step_fn, **donate_kw)
    rep = meshlib.replicated(mesh)
    dat = meshlib.batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(rep, dat, dat, rep, rep, rep),
                   out_shardings=(rep, rep), **donate_kw)
