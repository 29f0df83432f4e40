"""Free adversarial training (replay) and fast (FGSM) adversarial training.

Parity targets:
* Free-AT: ImageNet/free_imagenet/AT_hfs_canny_free_imagenet_ddp.py:284-337 —
  a PERSISTENT noise buffer carried across batches; each batch runs n_repeats
  of {forward on clamp(x+noise), one backward producing BOTH the param grads
  and the noise grad, noise += fgsm_step*sign(noise_grad) clamped to
  +/-clip_eps, optimizer step}. Epoch count is divided by n_repeats at the
  driver level.
* Fast-AT: ImageNet/fgsm_imagenet/main_fast.py:200-288 — per repeat:
  (re)initialise noise uniformly if random_init, one ascent pass on the noise
  (its param grads are discarded), then a descent pass on the model with the
  updated noise fixed; cyclic LR per minibatch-repeat. Both passes run the
  train-mode model (BN stats update twice per repeat, as in torch).

Both are single jitted steps with `lax.scan` over the repeats — the carried
state is (params, momentum, batch_stats, noise), so the whole replay loop is
one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..parallel import mesh as meshlib
from ..train.modelops import ModelOps, cross_entropy, topk_accuracy
from ..train.sgd import batchnorm_decay_mask, sgd_update
from ..train.trainer import OptimConfig, TrainState, to_float_pixels


@dataclasses.dataclass(frozen=True)
class FreeFastConfig:
    n_repeats: int = 4
    fgsm_step: float = 4.0 / 255
    clip_eps: float = 4.0 / 255
    random_init: bool = True     # fast-AT per-batch noise re-init


def init_noise(batch_size: int, image_size: int, channels: int = 3) -> jnp.ndarray:
    return jnp.zeros((batch_size, image_size, image_size, channels), jnp.float32)


def build_free_train_step(ops: ModelOps, cfg: FreeFastConfig, opt: OptimConfig,
                          mesh=None, donate: bool = False):
    """step(state, noise, x, y, key, lr) -> (state, noise, metrics)."""

    def step_fn(state: TrainState, noise, x, y, key, lr):
        x = to_float_pixels(x)
        decay_mask = (batchnorm_decay_mask(state.params)
                      if opt.bn_no_decay else None)

        def repeat_body(carry, k):
            params, buf, bs, nz = carry

            def loss_fn(p, n):
                in1 = jnp.clip(x + n, 0.0, 1.0)
                logits, bs2 = ops.logits_train(p, bs, in1, k)
                return cross_entropy(logits, y, "mean"), (bs2, logits)

            (loss, (bs2, logits)), (gp, gn) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, nz)
            nz = jnp.clip(nz + cfg.fgsm_step * jnp.sign(gn),
                          -cfg.clip_eps, cfg.clip_eps)
            params, buf = sgd_update(params, gp, buf, lr=lr,
                                     momentum=opt.momentum,
                                     weight_decay=opt.weight_decay,
                                     decay_mask=decay_mask)
            return (params, buf, bs2, nz), (loss, logits)

        keys = jax.random.split(key, cfg.n_repeats)
        (params, buf, bs, noise), (losses, logits_all) = jax.lax.scan(
            repeat_body, (state.params, state.momentum_buf,
                          state.batch_stats, noise), keys)
        new_state = TrainState(params=params, batch_stats=bs,
                               momentum_buf=buf,
                               step=state.step + cfg.n_repeats)
        metrics = {"loss": losses[-1], **topk_accuracy(logits_all[-1], y)}
        return new_state, noise, metrics

    donate_kw = {"donate_argnums": (0, 1)} if donate else {}
    if mesh is None:
        return jax.jit(step_fn, **donate_kw)
    rep, dat = meshlib.replicated(mesh), meshlib.batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(rep, dat, dat, dat, rep, rep),
                   out_shardings=(rep, dat, rep), **donate_kw)


def build_fast_train_step(ops: ModelOps, cfg: FreeFastConfig, opt: OptimConfig,
                          mesh=None, donate: bool = False):
    """step(state, noise, x, y, key, lr) -> (state, noise, metrics).
    LR is per-call (the cyclic schedule advances every repeat at the host)."""

    def step_fn(state: TrainState, noise, x, y, key, lr):
        x = to_float_pixels(x)
        decay_mask = (batchnorm_decay_mask(state.params)
                      if opt.bn_no_decay else None)

        def repeat_body(carry, k):
            params, buf, bs, nz = carry
            k_init, k_asc, k_desc = jax.random.split(k, 3)
            if cfg.random_init:
                nz = jax.random.uniform(k_init, nz.shape, minval=-cfg.clip_eps,
                                        maxval=cfg.clip_eps)

            # ascend on the noise (param grads of this pass are discarded;
            # its BN-stat updates are kept, as in torch)
            def ascend_loss(n):
                in1 = jnp.clip(x + n, 0.0, 1.0)
                logits, bs2 = ops.logits_train(params, bs, in1, k_asc)
                return cross_entropy(logits, y, "mean"), bs2

            gn, bs = jax.grad(ascend_loss, has_aux=True)(nz)
            nz = jnp.clip(nz + cfg.fgsm_step * jnp.sign(gn),
                          -cfg.clip_eps, cfg.clip_eps)

            # descend on the model with the noise fixed
            def descend_loss(p):
                in1 = jnp.clip(x + nz, 0.0, 1.0)
                logits, bs2 = ops.logits_train(p, bs, in1, k_desc)
                return cross_entropy(logits, y, "mean"), (bs2, logits)

            (loss, (bs, logits)), gp = jax.value_and_grad(
                descend_loss, has_aux=True)(params)
            params, buf = sgd_update(params, gp, buf, lr=lr,
                                     momentum=opt.momentum,
                                     weight_decay=opt.weight_decay,
                                     decay_mask=decay_mask)
            return (params, buf, bs, nz), (loss, logits)

        keys = jax.random.split(key, cfg.n_repeats)
        (params, buf, bs, noise), (losses, logits_all) = jax.lax.scan(
            repeat_body, (state.params, state.momentum_buf,
                          state.batch_stats, noise), keys)
        new_state = TrainState(params=params, batch_stats=bs,
                               momentum_buf=buf,
                               step=state.step + cfg.n_repeats)
        metrics = {"loss": losses[-1], **topk_accuracy(logits_all[-1], y)}
        return new_state, noise, metrics

    donate_kw = {"donate_argnums": (0, 1)} if donate else {}
    if mesh is None:
        return jax.jit(step_fn, **donate_kw)
    rep, dat = meshlib.replicated(mesh), meshlib.batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(rep, dat, dat, dat, rep, rep),
                   out_shardings=(rep, dat, rep), **donate_kw)
