"""Training objectives: ST / AT / targeted-AT(+trick) / ALP / TRADES / AVmixup.

Each objective is a pure function from (params, batch_stats, batch, key) to
(loss, new batch_stats, metric logits, extras), assembled by
`build_objective` into a single jittable unit the train step differentiates.

Parity notes (semantics copied from the reference drivers, NOT the code):
* AT-family attacks run against the TRAIN-mode model (dropout live, BN batch
  stats + running-stat updates every attack forward) —
  MNIST/experiments_mnist.py:227, Tiny_ImageNet/experiments_tinyimagenet.py:283.
* ALP/TRADES inner attacks switch to EVAL mode with a 0.001*N(0,1) init
  (utils/attacks.py:249-250, 383); after the attack the reference computes
  `output = model(data_adv)` while the model is STILL in eval mode, so ALP's
  adversarial logits (and the TRADES metric logits) are eval-mode; TRADES'
  loss then recomputes train-mode adv logits inside criterion.loss
  (utils/attacks.py:421-429).
* targeted AT trains on CE vs the TRUE labels after a targeted attack
  (experiments_imagenet.py:247-266).
* tarAVmixup reproduces the reference's inner-loss quirk: the "targets" fed
  to the log-prob product are fmod(one_hot + randint, nclass) — a
  well-defined (if odd) computation we match exactly (utils/attacks.py:488-501).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..attacks.pgd import PGDConfig, pgd_linf, random_targets
from ..train.modelops import (ModelOps, cross_entropy, kl_div_batchmean,
                              label_smooth_loss, soft_cross_entropy_sum)
from ..ops.square import add_square


@dataclasses.dataclass(frozen=True)
class MethodConfig:
    method_name: str
    epsilon: float = 8.0 / 255
    num_steps: int = 10
    step_size: float = 2.0 / 255
    random: bool = True
    beta: float = 1.0                 # ALP / TRADES weight
    num_classes: int = 10
    label_smooth: float = 0.0         # trick training
    prob_start_from_clean: float = 0.0
    gamma: float = 2.0                # AVmixup vertex scale
    lambda1: float = 1.0              # AVmixup clean label smoothing
    lambda2: float = 0.1              # AVmixup vertex label smoothing
    # pre_square input augmentation (EE_BPDA3_AT_pre_square configs)
    pre_square: bool = False
    square_epsilon: float = 0.05
    square_n_queries: int = 1
    square_size: int = 64
    # attack-loop unroll cap (None -> policy default; config key
    # `attack_unroll`). Resolution-dependent: full unroll measured +14% at
    # 64x64 but ~2% SLOWER at 224x224, where the unrolled buffers crowd HBM
    # (docs/PERF.md).
    attack_unroll: Optional[int] = None


def _unroll(num_steps: int, cap: Optional[int] = None) -> int:
    """Attack-loop unroll policy: full unroll measured +14% on TPU for
    PGD-10 at 64x64 (while-loops block cross-iteration scheduling); cap at
    10 to bound compile time for PGD-40/100 loops. At 224x224 the rolled
    loop wins — pass cap=1 (config `attack_unroll`). EE_ATTACK_UNROLL
    overrides both (perf experiments; docs/PERF.md)."""
    env = os.environ.get("EE_ATTACK_UNROLL")
    if env:
        cap = int(env)
    elif cap is None:
        cap = 10
    return max(1, min(num_steps, cap))


def canonical_method(name: str) -> str:
    """Map the reference's many method_name strings onto objective kinds.

    The EE_*/FD_* prefixes select the architecture, not the loss — every one
    of them trains with the same PGD-AT (or targeted-AT) objective.
    """
    if name == "ST":
        return "st"
    if "trick" in name:
        return "tar_at_trick"
    if "ALP" in name:
        return "tar_alp" if name.startswith("tar") else "alp"
    if "TRADES" in name.upper():
        return "trades"
    if "AVmixup" in name:
        return "tar_avmixup" if name.startswith("tar") else "avmixup"
    if name.startswith("tar"):
        return "tar_at"
    return "at"


def tar_init_policy(kind: str, random: bool) -> str:
    """Random-init selection for the targeted-AT family. The 'trick'
    Bernoulli-gated init only fires when args.random is set (reference
    targeted_PGD_trick, utils/attacks.py:68-73); plain targeted_PGD likewise
    gates its uniform init on args.random (utils/attacks.py:42-44)."""
    if not random:
        return "none"
    return "trick" if kind == "tar_at_trick" else "uniform"


def _avmixup_label_smoothing(one_hot: jnp.ndarray, factor: float, nclass: int) -> jnp.ndarray:
    """one_hot*f + (one_hot-1)*((f-1)/(nclass-1)) (utils/attacks.py:444-445)."""
    return one_hot * factor + (one_hot - 1.0) * ((factor - 1.0) / float(nclass - 1))


class Objective:
    """Bundles adversarial-example generation + the parameter loss for one
    training method. `loss(params, batch_stats, x, y, key)` returns
    (loss, (new_batch_stats, metric_logits))."""

    def __init__(self, ops: ModelOps, cfg: MethodConfig):
        self.ops = ops
        self.cfg = cfg
        self.kind = canonical_method(cfg.method_name)

    # ---- attack loss closures -------------------------------------------
    def _train_ce_sum(self, params, labels):
        def loss_fn(x, batch_stats, key):
            logits, bs = self.ops.logits_train(params, batch_stats, x, key)
            return cross_entropy(logits, labels, "sum"), bs
        return loss_fn

    def _train_neg_soft_ce(self, params, soft_targets):
        def loss_fn(x, batch_stats, key):
            logits, bs = self.ops.logits_train(params, batch_stats, x, key)
            return soft_cross_entropy_sum(logits, soft_targets), bs
        return loss_fn

    def _eval_ce(self, params, batch_stats, labels):
        def loss_fn(x, _aux, key):
            logits = self.ops.logits_eval(params, batch_stats, x, key)
            return cross_entropy(logits, labels, "mean"), _aux
        return loss_fn

    def _eval_kl(self, params, batch_stats, clean_prob):
        def loss_fn(x, _aux, key):
            logits = self.ops.logits_eval(params, batch_stats, x, key)
            return kl_div_batchmean(jax.nn.log_softmax(logits, axis=-1), clean_prob), _aux
        return loss_fn

    # ---- objective entry point ------------------------------------------
    def loss(self, params, batch_stats, x, y, key):
        cfg = self.cfg
        sg_params = jax.lax.stop_gradient(params)
        if cfg.pre_square:
            key, k_sq = jax.random.split(key)
            x = add_square(x, k_sq, epsilon=cfg.square_epsilon,
                           n_queries=cfg.square_n_queries)

        kind = self.kind
        if kind == "st":
            logits, bs = self.ops.logits_train(params, batch_stats, x, key)
            return cross_entropy(logits, y, "mean"), (bs, logits)

        if kind in ("at", "tar_at", "tar_at_trick"):
            return self._at_loss(params, sg_params, batch_stats, x, y, key, kind)
        if kind in ("alp", "tar_alp"):
            return self._alp_loss(params, sg_params, batch_stats, x, y, key, kind)
        if kind == "trades":
            return self._trades_loss(params, sg_params, batch_stats, x, y, key)
        if kind in ("avmixup", "tar_avmixup"):
            return self._avmixup_loss(params, sg_params, batch_stats, x, y, key, kind)
        raise ValueError(f"unknown objective {kind!r} for method {cfg.method_name!r}")

    # ---- AT family -------------------------------------------------------
    def _at_loss(self, params, sg_params, batch_stats, x, y, key, kind):
        cfg = self.cfg
        key_tgt, key_atk, key_fwd = jax.random.split(key, 3)
        if kind == "at":
            attack_labels, ascend, init = y, True, ("uniform" if cfg.random else "none")
        else:
            attack_labels = random_targets(key_tgt, y, cfg.num_classes)
            ascend = False
            init = tar_init_policy(kind, cfg.random)
        pcfg = PGDConfig(epsilon=cfg.epsilon, num_steps=cfg.num_steps,
                         step_size=cfg.step_size, random_init=init,
                         prob_start_from_clean=cfg.prob_start_from_clean,
                         ascend=ascend, unroll=_unroll(cfg.num_steps, cfg.attack_unroll))
        x_adv, bs = pgd_linf(self._train_ce_sum(sg_params, attack_labels),
                             x, key_atk, pcfg, aux=batch_stats)
        x_adv = jax.lax.stop_gradient(x_adv)
        logits, bs = self.ops.logits_train(params, bs, x_adv, key_fwd)
        if kind == "tar_at_trick":
            loss = label_smooth_loss(logits, y, cfg.label_smooth)
        else:
            loss = cross_entropy(logits, y, "mean")
        return loss, (bs, logits)

    # ---- ALP -------------------------------------------------------------
    def _alp_loss(self, params, sg_params, batch_stats, x, y, key, kind):
        cfg = self.cfg
        key_tgt, key_clean, key_atk, key_out = jax.random.split(key, 4)
        # clean train-mode forward happens BEFORE the attack in the reference,
        # so its running-stat update is visible to the eval-mode attack.
        _, bs1 = self.ops.logits_train(sg_params, batch_stats, x, key_clean)
        if kind == "tar_alp":
            tgt = random_targets(key_tgt, y, cfg.num_classes)
            pcfg = PGDConfig(cfg.epsilon, cfg.num_steps, cfg.step_size,
                             random_init="gaussian", ascend=False,
                             unroll=_unroll(cfg.num_steps, cfg.attack_unroll))
            attack = self._eval_ce(sg_params, bs1, tgt)
        else:
            pcfg = PGDConfig(cfg.epsilon, cfg.num_steps, cfg.step_size,
                             random_init="gaussian", ascend=True,
                             unroll=_unroll(cfg.num_steps, cfg.attack_unroll))
            attack = self._eval_ce(sg_params, bs1, y)
        x_adv, _ = pgd_linf(attack, x, key_atk, pcfg, aux=None)
        x_adv = jax.lax.stop_gradient(x_adv)

        # Gradient path: recompute the clean train-mode forward (same key ->
        # same dropout mask as the stat-update pass) and the eval-mode
        # adversarial logits (the reference's `output` quirk).
        preds, bs1 = self.ops.logits_train(params, batch_stats, x, key_clean)
        out = self.ops.logits_eval(params, bs1, x_adv, key_out)
        loss_robust = 0.5 * cross_entropy(preds, y) + 0.5 * cross_entropy(out, y)
        loss_alp = jnp.mean((preds - out) ** 2)
        return loss_robust + cfg.beta * loss_alp, (bs1, out)

    # ---- TRADES ----------------------------------------------------------
    def _trades_loss(self, params, sg_params, batch_stats, x, y, key):
        cfg = self.cfg
        key_clean, key_atk, key_metric, key_adv = jax.random.split(key, 4)
        preds0, bs1 = self.ops.logits_train(sg_params, batch_stats, x, key_clean)
        clean_prob0 = jax.nn.softmax(preds0, axis=-1)
        pcfg = PGDConfig(cfg.epsilon, cfg.num_steps, cfg.step_size,
                         random_init="gaussian", ascend=True,
                         unroll=_unroll(cfg.num_steps, cfg.attack_unroll))
        x_adv, _ = pgd_linf(self._eval_kl(sg_params, bs1, clean_prob0),
                            x, key_atk, pcfg, aux=None)
        x_adv = jax.lax.stop_gradient(x_adv)
        # metric logits: eval-mode forward right after the attack (driver quirk)
        metric_logits = self.ops.logits_eval(sg_params, bs1, x_adv, key_metric)

        # loss: clean CE + beta * KL, both recomputed with the gradient path;
        # the adversarial branch runs in TRAIN mode (criterion.loss recomputes
        # after model.train(), utils/attacks.py:421-429). Gradient flows
        # through clean_prob too (the reference does not detach it).
        preds, bs1 = self.ops.logits_train(params, batch_stats, x, key_clean)
        clean_prob = jax.nn.softmax(preds, axis=-1)
        adv_logits, bs2 = self.ops.logits_train(params, bs1, x_adv, key_adv)
        loss = (cross_entropy(preds, y, "mean")
                + cfg.beta * kl_div_batchmean(jax.nn.log_softmax(adv_logits, axis=-1),
                                              clean_prob))
        return loss, (bs2, metric_logits)

    # ---- AVmixup ---------------------------------------------------------
    def _avmixup_loss(self, params, sg_params, batch_stats, x, y, key, kind):
        cfg = self.cfg
        nclass = cfg.num_classes
        key_tgt, key_atk, key_w, key_fwd = jax.random.split(key, 4)
        one_hot = jax.nn.one_hot(y, nclass, dtype=x.dtype)

        if kind == "avmixup":
            attack = self._train_neg_soft_ce(sg_params, one_hot)
            ascend = True
        else:
            # reference quirk (utils/attacks.py:488-501): "target labels" are
            # fmod(one_hot + randint(1, nclass, shape=(B, nclass)), nclass),
            # used directly as weights in the log-prob product; descend.
            offs = jax.random.randint(key_tgt, one_hot.shape, 1, nclass)
            weird_targets = jnp.mod(one_hot + offs.astype(x.dtype), float(nclass))
            attack = self._train_neg_soft_ce(sg_params, weird_targets)
            ascend = False

        pcfg = PGDConfig(cfg.epsilon, cfg.num_steps, cfg.step_size,
                         random_init=("uniform" if cfg.random else "none"),
                         ascend=ascend, unroll=_unroll(cfg.num_steps, cfg.attack_unroll))
        x_adv, bs = pgd_linf(attack, x, key_atk, pcfg, aux=batch_stats)
        x_adv = jax.lax.stop_gradient(x_adv)

        vertex = jnp.clip(x + cfg.gamma * (x_adv - x), 0.0, 1.0)
        y_nat = _avmixup_label_smoothing(one_hot, cfg.lambda1, nclass)
        y_vertex = _avmixup_label_smoothing(one_hot, cfg.lambda2, nclass)
        w = jax.random.uniform(key_w, (x.shape[0],) + (1,) * (x.ndim - 1))  # Beta(1,1)
        wy = w.reshape(-1, 1)
        x_mix = x * w + vertex * (1.0 - w)
        y_mix = y_nat * wy + y_vertex * (1.0 - wy)

        logits, bs = self.ops.logits_train(params, bs, x_mix, key_fwd)
        loss = soft_cross_entropy_sum(logits, y_mix) / x.shape[0]
        return loss, (bs, logits)
