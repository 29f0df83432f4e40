"""TrainState + jitted train/eval steps.

One train step = (adversarial example generation + parameter update) fused in
a single XLA program: the PGD inner loop (`lax.fori_loop` over forward+VJP),
the objective loss, the parameter gradient, and the SGD update all compile
together — the reference's hot loop #1 (SURVEY.md section 3) with zero
host round-trips per batch.

Data parallelism: steps are jitted with parameters/state replicated and the
batch sharded over the mesh 'data' axis (see parallel/mesh.py). BatchNorm
batch statistics reduce over the global batch (SyncBN parity); gradient
all-reduce is inserted by XLA.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..attacks.cw import CWConfig, cw_linf
from ..attacks.pgd import PGDConfig, fgsm, pgd_linf, random_targets
from ..objectives.methods import MethodConfig, Objective, _unroll
from ..ops.square import add_square
from ..parallel import mesh as meshlib
from .modelops import ModelOps, cross_entropy, topk_accuracy
from .sgd import init_momentum, sgd_update


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    momentum_buf: Any
    step: jnp.ndarray  # global step counter


def to_float_pixels(x):
    """On-device uint8 -> [0,1] float32 (no-op for float inputs, resolved at
    trace time). Pairs with datasets' `as_uint8=True`: pixels cross the
    host->device link as uint8 (4x less traffic — on remote-dispatch
    platforms the transfer, not the step, was the training bottleneck) and
    convert on device."""
    if x.dtype == jnp.uint8:
        # divide (not multiply-by-reciprocal): bit-identical to the host
        # pipeline's x / 255.0 for every uint8 value (ADVICE r2 — the
        # reciprocal form differs by 1 ulp for 126 of 256 values)
        return x.astype(jnp.float32) / 255.0
    return x


def create_train_state(ops: ModelOps, key: jax.Array, sample_x) -> TrainState:
    params, batch_stats = ops.init(key, sample_x)
    return TrainState(params=params, batch_stats=batch_stats,
                      momentum_buf=init_momentum(params),
                      step=jnp.zeros((), jnp.int32))


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    momentum: float = 0.9
    weight_decay: float = 0.0
    bn_no_decay: bool = False   # fast-AT: exclude BatchNorm params from decay


def build_train_step(ops: ModelOps, method: MethodConfig, opt: OptimConfig,
                     mesh=None, donate: bool = False,
                     state_sharding=None) -> Callable:
    """Returns jitted step(state, x, y, key, lr) -> (state, metrics).

    `state_sharding` (optional, requires mesh) supplies per-leaf shardings
    for the TrainState — used for tensor-parallel parameter layouts
    (parallel/sharding.py); default is fully replicated parameters."""
    objective = Objective(ops, method)

    def step_fn(state: TrainState, x, y, key, lr):
        x = to_float_pixels(x)
        (loss, (bs, logits)), grads = jax.value_and_grad(
            objective.loss, has_aux=True)(state.params, state.batch_stats, x, y, key)
        new_params, new_buf = sgd_update(
            state.params, grads, state.momentum_buf, lr=lr,
            momentum=opt.momentum, weight_decay=opt.weight_decay)
        new_state = TrainState(params=new_params, batch_stats=bs,
                               momentum_buf=new_buf, step=state.step + 1)
        metrics = {"loss": loss, **topk_accuracy(logits, y)}
        return new_state, metrics

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        return jax.jit(step_fn, **donate_kw)
    rep = meshlib.replicated(mesh)
    dat = meshlib.batch_sharding(mesh)
    st_sh = state_sharding if state_sharding is not None else rep
    return jax.jit(step_fn, in_shardings=(st_sh, dat, dat, rep, rep),
                   out_shardings=(st_sh, rep), **donate_kw)


def build_chained_train_step(ops: ModelOps, method: MethodConfig,
                             opt: OptimConfig, mesh=None,
                             donate: bool = False,
                             state_sharding=None) -> Callable:
    """K train steps per device dispatch: step(state, xs, ys, keys, lr) with
    xs/ys stacked on a leading `chain` axis (K = xs.shape[0]), one `lax.scan`
    over the stack — the math
    is identical to `chain` sequential build_train_step calls, but the host
    pays ONE dispatch for K steps. On remote-dispatch platforms (axon: ~7 ms
    per program launch) this is the difference between host-bound and
    device-bound small-batch training (docs/PERF.md). Returns
    (new_state, metrics-of-last-step)."""
    objective = Objective(ops, method)

    def step_fn(state: TrainState, xs, ys, keys, lr):
        def one(st: TrainState, batch):
            x, y, key = batch
            x = to_float_pixels(x)  # inside the scan: one batch of f32 live
            (loss, (bs, logits)), grads = jax.value_and_grad(
                objective.loss, has_aux=True)(st.params, st.batch_stats,
                                              x, y, key)
            new_params, new_buf = sgd_update(
                st.params, grads, st.momentum_buf, lr=lr,
                momentum=opt.momentum, weight_decay=opt.weight_decay)
            metrics = {"loss": loss, **topk_accuracy(logits, y)}
            return TrainState(params=new_params, batch_stats=bs,
                              momentum_buf=new_buf, step=st.step + 1), metrics

        state, metrics = jax.lax.scan(one, state, (xs, ys, keys))
        return state, jax.tree.map(lambda m: m[-1], metrics)

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        return jax.jit(step_fn, **donate_kw)
    rep = meshlib.replicated(mesh)
    # batch axis is dim 1 of the [chain, batch, ...] stacks
    from jax.sharding import NamedSharding, PartitionSpec as P
    dat = NamedSharding(mesh, P(None, "data"))
    st_sh = state_sharding if state_sharding is not None else rep
    return jax.jit(step_fn, in_shardings=(st_sh, dat, dat, rep, rep),
                   out_shardings=(st_sh, rep), **donate_kw)


@dataclasses.dataclass(frozen=True)
class EvalAttackConfig:
    """Validation attack battery entry (reference validate(), e.g.
    MNIST/experiments_mnist.py:271-357: model.eval(), PGD/FGSM/CW)."""
    attack_method: str = "PGD"     # PGD | FGSM | CW | none
    epsilon: float = 8.0 / 255
    num_steps: int = 10
    step_size: float = 2.0 / 255
    random: bool = True
    num_classes: int = 10
    cw_iters: int = 20
    restarts: int = 1              # multi-restart PGD (fast-AT validate_pgd,
                                   # fgsm_imagenet/lib/validation.py:31-57)
    # 'tar*' methods validate with TARGETED attacks on random wrong labels
    # (experiments_tinyimagenet.py:355-371); accuracy is still vs true labels.
    targeted: bool = False
    # pre_square methods apply Add_Square to the validation inputs before the
    # clean forward AND the attack (experiments_tinyimagenet.py:341-352).
    pre_square: bool = False
    square_epsilon: float = 0.05
    square_n_queries: int = 1
    # attack-loop unroll cap (config `attack_unroll`; None -> policy
    # default — roll at 224px, see objectives/methods._unroll)
    unroll_cap: Optional[int] = None


def eval_protocol(cfg) -> dict:
    """Derive the reference validate() protocol kwargs from a config —
    shared by train.py's per-epoch/--evaluate path and eval.py's batteries
    so the two can never diverge (tar* -> targeted attacks on random wrong
    labels, pre_square -> squared eval inputs, restarts, unroll cap)."""
    method = str(cfg.get("method_name", ""))
    return dict(
        targeted="tar" in method,
        pre_square="pre_square" in method,
        square_epsilon=float(cfg.get("epsilon", 0.05)),
        square_n_queries=int(cfg.get("n_queries", 1)),
        restarts=int(cfg.get("restarts", 1)),
        unroll_cap=(int(cfg["attack_unroll"])
                    if cfg.get("attack_unroll") is not None else None),
    )


def build_eval_step(ops: ModelOps, atk: EvalAttackConfig, mesh=None) -> Callable:
    """Returns jitted eval(state, x, y, key) -> metrics with clean_/adv_ keys.
    Model runs in eval mode throughout (reference validate())."""

    def eval_loss(params, batch_stats, labels):
        def loss_fn(x, _aux, key):
            logits = ops.logits_eval(params, batch_stats, x, key)
            return cross_entropy(logits, labels, "sum"), _aux
        return loss_fn

    def eval_fn(state: TrainState, x, y, key):
        x = to_float_pixels(x)
        key_clean, key_atk, key_adv, key_tgt, key_sq = jax.random.split(key, 5)
        if atk.pre_square:
            x = add_square(x, key_sq, epsilon=atk.square_epsilon,
                           n_queries=atk.square_n_queries)
        clean_logits = ops.logits_eval(state.params, state.batch_stats, x, key_clean)
        metrics = {"clean_loss": cross_entropy(clean_logits, y),
                   **{f"clean_{k}": v for k, v in topk_accuracy(clean_logits, y).items()}}
        if atk.attack_method == "none":
            return metrics
        # targeted battery: attack drives toward random wrong labels
        # (reference validate(), experiments_tinyimagenet.py:355-371)
        tgt = random_targets(key_tgt, y, atk.num_classes) if atk.targeted else y
        if atk.attack_method == "PGD":
            pcfg = PGDConfig(atk.epsilon, atk.num_steps, atk.step_size,
                             random_init=("uniform" if atk.random else "none"),
                             ascend=not atk.targeted,
                             unroll=_unroll(atk.num_steps, atk.unroll_cap))
            loss_fn = eval_loss(state.params, state.batch_stats, tgt)
            x_adv, _ = pgd_linf(loss_fn, x, key_atk, pcfg)
            # extra restarts: keep the first run's output, then swap in any
            # restart that flips a still-correct prediction (validation.py:50-57).
            # fold_in keeps restart streams independent of the consumed key.
            for r in range(1, atk.restarts):
                k_r, k_p = jax.random.split(jax.random.fold_in(key_atk, r))
                cand, _ = pgd_linf(loss_fn, x, k_r, pcfg)
                pred = jnp.argmax(ops.logits_eval(state.params,
                                                  state.batch_stats, cand, k_p),
                                  axis=-1)
                broke = (pred != y)
                sel = broke[(slice(None),) + (None,) * (x.ndim - 1)]
                x_adv = jnp.where(sel, cand, x_adv)
        elif atk.attack_method == "FGSM":
            x_adv, _ = fgsm(eval_loss(state.params, state.batch_stats, tgt),
                            x, key_atk, step_size=atk.step_size,
                            targeted=atk.targeted)
        elif atk.attack_method == "CW":
            fwd = lambda xx, kk: ops.logits_eval(state.params, state.batch_stats, xx, kk)
            ccfg = CWConfig(magnitude=atk.epsilon, max_eps=atk.epsilon,
                            max_iters=atk.cw_iters, num_classes=atk.num_classes)
            x_adv, _ = cw_linf(fwd, x, y, key_atk, ccfg,
                               target=(tgt if atk.targeted else None))
        else:
            raise NotImplementedError(atk.attack_method)
        adv_logits = ops.logits_eval(state.params, state.batch_stats, x_adv, key_adv)
        metrics.update({"adv_loss": cross_entropy(adv_logits, y),
                        **{f"adv_{k}": v for k, v in topk_accuracy(adv_logits, y).items()}})
        return metrics

    if mesh is None:
        return jax.jit(eval_fn)
    rep = meshlib.replicated(mesh)
    dat = meshlib.batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(rep, dat, dat, rep), out_shardings=rep)
