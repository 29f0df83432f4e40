#!/usr/bin/env python
"""Unified training/eval entry point for edge_enhancement_tpu.

One driver for every dataset x method x arch combination the reference
spreads over nine scripts (experiments_mnist.py, experiments_tinyimagenet.py,
experiments_imagenet.py, the AWP/free/fast drivers):

    python train.py --config edge_enhancement_tpu/configs/mnist/ee_at_bpda3_square.yml \
        --data /path/to/mnist            # or --data synthetic
    python train.py --config ... --evaluate --resume <ckpt_dir>

Parallelism: the train/eval steps are jitted over a `jax.sharding.Mesh` of
all local devices with the batch sharded on the 'data' axis — single-chip,
multi-chip, and (via jax.distributed) multi-host all run this same program.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from edge_enhancement_tpu.data.datasets import get_dataset
from edge_enhancement_tpu.models.registry import build_model
from edge_enhancement_tpu.objectives.methods import MethodConfig
from edge_enhancement_tpu.objectives.awp import AWPConfig, build_awp_train_step
from edge_enhancement_tpu.objectives.free_fast import (FreeFastConfig,
                                                       build_fast_train_step,
                                                       build_free_train_step,
                                                       init_noise)
from edge_enhancement_tpu.parallel import mesh as meshlib
from edge_enhancement_tpu.train import checkpoint as ckpt
from edge_enhancement_tpu.train.modelops import ModelOps
from edge_enhancement_tpu.train import schedules
from edge_enhancement_tpu.train.trainer import (EvalAttackConfig, OptimConfig,
                                                build_chained_train_step,
                                                build_eval_step,
                                                build_train_step,
                                                create_train_state,
                                                eval_protocol)
from edge_enhancement_tpu.utils.config import (apply_platform, base_parser,
                                                load_config)
from edge_enhancement_tpu.utils.meters import (AverageMeter, Logger,
                                               adv_summary, clean_summary,
                                               train_line)


def make_method_config(cfg, num_classes: int) -> MethodConfig:
    return MethodConfig(
        method_name=cfg["method_name"],
        epsilon=float(cfg.get("epsilon", 8 / 255)),
        num_steps=int(cfg.get("num_steps_1", 10)),
        step_size=float(cfg.get("step_size_1", 2 / 255)),
        random=bool(cfg.get("random", True)),
        beta=float(cfg.get("beta", 1.0)),
        num_classes=num_classes,
        label_smooth=float(cfg.get("label_smooth", 0.0)),
        prob_start_from_clean=float(cfg.get("prob_start_from_clean", 0.0)),
        pre_square="pre_square" in cfg["method_name"],
        square_epsilon=float(cfg.get("epsilon", 0.05)),
        square_n_queries=int(cfg.get("n_queries", 1)),
        attack_unroll=(int(cfg["attack_unroll"])
                       if cfg.get("attack_unroll") is not None else None),
    )


def epoch_lr(cfg, epoch: int) -> float:
    name = cfg.get("lr_schedule", "piecewise_50_75")
    lr0 = float(cfg["lr"])
    if name == "multistep":
        return schedules.multistep(lr0, epoch, tuple(cfg.get("milestones", (50, 80))))
    if name == "step30":
        return schedules.step30(lr0, epoch)
    if name == "step30_free":
        return schedules.step30_free(lr0, epoch, int(cfg.get("n_repeats", 4)))
    return schedules.piecewise_50_75(lr0, epoch, int(cfg["epochs"]))


def run_validation(log, eval_step, mesh, state, ds, cfg, *, num_steps, step_size,
                   limit=None):
    clean1, clean5, adv1, adv5 = (AverageMeter() for _ in range(4))
    key = jax.random.PRNGKey(int(cfg.get("seed", 1)) + 777)
    # each process loads its disjoint share of the global eval batch
    # (reference DistributedSampler on the val set, experiments_imagenet.py:158)
    local_bs = int(cfg["batch_size"]) // jax.process_count()
    # pixels cross the host->device link as uint8 (4x less traffic; the
    # jitted steps convert on device — trainer.py::to_float_pixels)
    for i, (x, y) in enumerate(ds.batches(local_bs, shuffle=False, seed=0,
                                          process_index=jax.process_index(),
                                          process_count=jax.process_count(),
                                          as_uint8=True)):
        if limit is not None and i >= limit:
            break
        key, k = jax.random.split(key)
        xb, yb = meshlib.shard_batch(mesh, (x, y))
        m = jax.device_get(eval_step(state, xb, yb, k))
        # metrics are computed over the GLOBAL sharded batch; weight by it
        n_glob = len(y) * jax.process_count()
        clean1.update(m["clean_top1"], n_glob); clean5.update(m["clean_top5"], n_glob)
        if "adv_top1" in m:
            adv1.update(m["adv_top1"], n_glob); adv5.update(m["adv_top5"], n_glob)
    log(clean_summary(clean1, clean5))
    if adv1.count:
        log(adv_summary(adv1, adv5))
    # the reference's validate() returns the ADVERSARIAL top-1/top-5
    # (experiments_mnist.py:357) — best-checkpoint selection tracks robustness
    return (adv1.avg if adv1.count else clean1.avg), clean1.avg


def run_free_fast(cfg, ops, mesh, state, train_ds, val_ds, log, out_dir,
                  num_classes, start_epoch=0, best_prec1=0.0):
    """Free/fast-AT epoch loop (reference AT_*_free_imagenet_ddp.py:284-337,
    main_fast.py:200-288). Free: persistent noise, epochs/n_repeats, scaled
    step-30 LR. Fast: per-batch noise re-init, cyclic LR per minibatch."""
    import math
    fast = cfg["method_name"] == "fast_AT"
    n_repeats = int(cfg.get("n_repeats", 1 if fast else 4))
    ffcfg = FreeFastConfig(
        n_repeats=n_repeats,
        fgsm_step=float(cfg.get("fgsm_step", 4.0)) / 255.0,
        clip_eps=float(cfg.get("clip_eps", 4.0)) / 255.0,
        random_init=bool(cfg.get("random_init", True)))
    opt = OptimConfig(momentum=float(cfg.get("momentum", 0.9)),
                      weight_decay=float(cfg.get("weight_decay", 1e-4)),
                      bn_no_decay=fast)
    builder = build_fast_train_step if fast else build_free_train_step
    step = builder(ops, ffcfg, opt, mesh=mesh)

    # the config batch size is GLOBAL; each process loads/owns its share
    # (reference free-AT DDP batch_size/nGPU, AT_free_imagenet_ddp.py:154-161)
    batch_size = int(cfg["batch_size"]) // jax.process_count()
    cize = int(cfg.get("cize", cfg.get("crop_size", 224)))
    channels = 1 if cfg["dataset"] == "mnist" else 3
    # persistent noise shards with the batch; resume restores it (the
    # reference keeps global_noise_data alive across batches/epochs)
    noise_host = init_noise(batch_size, cize, channels)
    if cfg.get("resume"):
        # multihost: each process restores its own persisted noise rows
        # (ckpt.save_noise_shard); single-host falls back to the orbax
        # `extra` payload for old checkpoints
        shard = ckpt.load_noise_shard(cfg["resume"])
        if shard is not None and shard.shape == noise_host.shape:
            noise_host = shard
            log(f"=> restored free-AT replay noise shard "
                f"{noise_host.shape} (max |n| = {np.abs(noise_host).max():.4f})")
        else:
            payload = ckpt.load_checkpoint(cfg["resume"])
            saved_noise = None
            if payload is not None and "extra" in payload and "noise" in payload["extra"]:
                saved_noise = np.asarray(payload["extra"]["noise"])
            if saved_noise is not None and saved_noise.shape == noise_host.shape:
                noise_host = saved_noise
            else:
                # neither the per-process shard nor the orbax payload fits
                # this run shape (different process count / batch size /
                # crop): resuming silently changes the replay trajectory —
                # say so, naming whichever stale buffers were found
                found = [f"shard {shard.shape}"] if shard is not None else []
                if saved_noise is not None:
                    found.append(f"checkpoint buffer {saved_noise.shape}")
                if found:
                    log(f"WARNING: free-AT noise in {cfg['resume']} has "
                        f"{' and '.join(found)}, expected {noise_host.shape} "
                        "(process count / batch size changed?); replay "
                        "noise resets to zeros")
    noise = meshlib.shard_batch(mesh, noise_host)
    epochs = int(math.ceil(int(cfg["epochs"]) / n_repeats)) if not fast \
        else int(cfg["epochs"])
    limit = cfg.get("limit_batches")
    n_batches = max(len(train_ds) // (batch_size * jax.process_count()), 1)
    key = jax.random.PRNGKey(int(cfg.get("seed", 1)))
    # best_prec1 arrives restored from the checkpoint on resume (else 0.0)
    # so a worse post-resume epoch cannot overwrite the 'best' artifact

    # same validate() protocol as the generic path (eval_protocol: unroll
    # cap, restarts, tar/pre_square) so in-training and --evaluate/eval.py
    # validation can never diverge (ADVICE r2: the 224px free/fast configs
    # set attack_unroll: 1 and this eval must honour it too)
    eval_step = build_eval_step(ops, EvalAttackConfig(
        "PGD", float(cfg.get("epsilon", ffcfg.clip_eps)),
        int(cfg.get("num_steps_1", 10)),
        float(cfg.get("step_size_1", 1 / 255)),
        True, num_classes, **eval_protocol(cfg)), mesh=mesh)

    # resume continues at the checkpoint epoch (free: in replay-divided
    # units, matching what save_checkpoint below stored; fast: the phase
    # configs' start_epoch — main() already reconciled cfg vs checkpoint)
    for epoch in range(start_epoch, epochs):
        bt, dt, losses, top1, top5 = (AverageMeter() for _ in range(5))
        end = time.time()
        for i, (x, y) in enumerate(train_ds.batches(
                batch_size, shuffle=True, seed=int(cfg.get("seed", 1)),
                epoch=epoch, process_index=jax.process_index(),
                process_count=jax.process_count(), as_uint8=True)):
            if limit is not None and i >= limit:
                break
            dt.update(time.time() - end)
            if fast:
                # piecewise-linear absolute-epoch knots (main_fast.py:172);
                # default knots anchor at the PHASE start from the config —
                # NOT the resumed epoch — so a resumed run follows the same
                # ramp as an uninterrupted one
                ep_f = epoch + (i * n_repeats + 1) / max(n_batches, 1)
                knots_e = (cfg.get("lr_epochs")
                           or [int(cfg.get("start_epoch", 0)), epochs])
                knots_v = cfg.get("lr_values") or [float(cfg.get("lr", 0.1))] * 2
                lr = schedules.interp_knots(ep_f, knots_e, knots_v)
            else:
                lr = schedules.step30_free(float(cfg["lr"]), epoch, n_repeats)
            key, k = jax.random.split(key)
            xb, yb = meshlib.shard_batch(mesh, (x, y))
            state, noise, metrics = step(state, noise, xb, yb, k,
                                         jnp.float32(lr))
            if i % int(cfg.get("print_freq", 50)) == 0:
                m = jax.device_get(metrics)
                losses.update(m["loss"], len(y))
                top1.update(m["top1"], len(y)); top5.update(m["top5"], len(y))
                bt.update(time.time() - end)
                log(train_line(epoch, i, n_batches, bt, dt, losses, top1, top5))
            else:
                bt.update(time.time() - end)
            end = time.time()
        prec1, _ = run_validation(log, eval_step, mesh, state, val_ds, cfg,
                                  num_steps=int(cfg.get("num_steps_1", 10)),
                                  step_size=float(cfg.get("step_size_1", 1 / 255)),
                                  limit=limit)
        is_best = prec1 > best_prec1
        best_prec1 = max(prec1, best_prec1)
        # persist the replay-noise buffer so resume continues the in-run
        # trajectory: every process writes its own data-sharded rows
        # (rank-0's orbax payload only holds replicated state)
        ckpt_path = os.path.join(out_dir, "ckpt")
        ckpt.save_noise_shard(ckpt_path, noise)
        ckpt.save_checkpoint(ckpt_path, jax.device_get(state), epoch + 1,
                             cfg["arch"], best_prec1, is_best)
    log(f"=> done. best robust-eval Prec@1 {best_prec1:.3f}")


def main():
    args = base_parser().parse_args()
    cfg = load_config(args.config, vars(args))
    apply_platform(cfg)
    run(cfg)


def run(cfg):
    """Drive one full config (train or --evaluate). Split from main() so the
    config-surface smoke sweep (tests/test_config_smoke.py) can run every
    shipped YAML through the REAL driver at scaled-down shapes."""
    # Multi-host: one line replaces the reference's torch.distributed.launch +
    # NCCL process groups (experiments_imagenet.py:56). Each host then runs
    # the same mesh-sharded program; input batches are host-sharded via
    # ArrayDataset.batches(process_index/process_count).
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or cfg.get("multihost"):
        jax.distributed.initialize()
    dataset_name = cfg["dataset"]
    seed = int(cfg.get("seed", 1))

    image_size = cfg.get("cize") or cfg.get("crop_size")
    syn = cfg.get("synthetic_size")
    train_ds, spec = get_dataset(dataset_name, cfg.get("data"), train=True,
                                 image_size=image_size, synthetic_size=syn)
    val_ds, _ = get_dataset(dataset_name, cfg.get("data"), train=False,
                            image_size=image_size,
                            synthetic_size=syn // 2 if syn else None)
    num_classes = spec.num_classes

    model = build_model(cfg["arch"], cfg, num_classes)
    ops = ModelOps(model)
    mesh = meshlib.make_mesh()

    run_name = (f"{cfg['method_name']}/{cfg['arch']}-bs{cfg['batch_size']}"
                f"-lr{cfg['lr']}-seed{seed}")
    out_dir = os.path.join(cfg.get("output", "output"), dataset_name, run_name)
    log = Logger(os.path.join(out_dir, "log"))
    log(f"=> dataset {dataset_name}, arch {cfg['arch']}, method "
        f"{cfg['method_name']}, devices {mesh.devices.size}")

    # init state
    sample_x, _ = next(train_ds.batches(2, shuffle=False, seed=0))
    state = create_train_state(ops, jax.random.PRNGKey(seed),
                               jnp.asarray(sample_x[:1]))
    if cfg.get("pretrained"):
        # torchvision-format warm start (reference --pretrained builds
        # torchvision-pretrained backbones and swaps the head,
        # experiments_imagenet.py:65-81); --resume below still wins
        from tools.convert_torch_checkpoint import load_pretrained_torch
        state, n_loaded, skipped = load_pretrained_torch(
            state, cfg["arch"], cfg["pretrained"])
        log_skip = "".join(f"\n   skipped {k} (torch {ts} vs ours {fs})"
                           for k, ts, fs in skipped)
        log(f"=> warm-started {n_loaded} tensors from torch weights "
            f"{cfg['pretrained']}{log_skip}")
    start_epoch, best_prec1 = int(cfg.get("start_epoch", 0)), 0.0
    if cfg.get("resume"):
        payload = ckpt.load_checkpoint(cfg["resume"])
        if payload is not None:
            state, start_epoch, best_prec1 = ckpt.restore_into_state(state, payload)
            log(f"=> resumed from {cfg['resume']} (epoch {start_epoch})")
    state = meshlib.replicate(mesh, state)

    mcfg = make_method_config(cfg, num_classes)
    # NOTE: the MNIST driver's TRADES-without-weight-decay quirk
    # (experiments_mnist.py:90-92) is encoded in the mnist TRADES config
    # (weight_decay: 0); the TinyIN driver applies wd to TRADES normally.
    opt = OptimConfig(momentum=float(cfg.get("momentum", 0.9)),
                      weight_decay=float(cfg.get("weight_decay", 0.0)))

    # free/fast AT have their own replay loop (reference free_imagenet /
    # fgsm_imagenet drivers); dispatch before the generic objective path.
    # --evaluate skips it (the fast_*_evaluate configs run the PGD battery
    # only, reference main_fast.py configs.evaluate path).
    if cfg["method_name"] in ("free_AT", "fast_AT") and not cfg.get("evaluate"):
        return run_free_fast(cfg, ops, mesh, state, train_ds, val_ds, log,
                             out_dir, num_classes, start_epoch=start_epoch,
                             best_prec1=best_prec1)

    awp_warmup = None
    if cfg.get("awp_gamma") is not None:
        awp = AWPConfig(gamma=float(cfg["awp_gamma"]),
                        warmup=int(cfg.get("awp_warmup", 0)),
                        proxy_lr=float(cfg.get("awp_proxy_lr", 0.01)),
                        l1=float(cfg.get("l1", 0.0)))
        awp_warmup = awp.warmup
        train_step = build_awp_train_step(ops, mcfg, opt, awp, mesh=mesh,
                                          donate=True)
    else:
        train_step = build_train_step(ops, mcfg, opt, mesh=mesh, donate=True)

    # tar* methods validate with targeted attacks; pre_square methods square
    # the validation inputs (reference validate(),
    # experiments_tinyimagenet.py:341-371). Shared with eval.py.
    eval_proto = eval_protocol(cfg)
    eval_atk = EvalAttackConfig(
        attack_method=str(cfg.get("attack_method", "PGD")),
        epsilon=float(cfg.get("epsilon", 8 / 255)),
        num_steps=int(cfg.get("num_steps_1", 10)),
        step_size=float(cfg.get("step_size_1", 2 / 255)),
        random=bool(cfg.get("random", True)), num_classes=num_classes,
        **eval_proto)
    eval_step = build_eval_step(ops, eval_atk, mesh=mesh)

    if cfg.get("evaluate"):
        for tier in ("1", "2", "3"):
            ns, ss = cfg.get(f"num_steps_{tier}"), cfg.get(f"step_size_{tier}")
            if ns is None or ss is None:   # tiers come in (K, step) pairs
                continue
            log(f"=> evaluate num_steps:{ns}, step_size:{ss}")
            es = build_eval_step(ops, EvalAttackConfig(
                str(cfg.get("attack_method", "PGD")), float(cfg["epsilon"]),
                int(ns), float(ss), bool(cfg.get("random", True)),
                num_classes, **eval_proto), mesh=mesh)
            run_validation(log, es, mesh, state, val_ds, cfg,
                           num_steps=int(ns), step_size=float(ss),
                           limit=cfg.get("limit_batches"))
        return

    # the config batch size is GLOBAL (reference DDP divides by nGPU,
    # experiments_imagenet.py:154-161); each host loads its share.
    batch_size = int(cfg["batch_size"]) // jax.process_count()
    limit = cfg.get("limit_batches")
    key = jax.random.PRNGKey(seed)
    # device-side multi-step loop: K steps per dispatch (lax.scan over a
    # batch stack) — identical math, 1/K of the host dispatch overhead
    # (docs/PERF.md; ~7 ms/launch on remote-dispatch platforms). AWP keeps
    # per-batch LR stepping, so it stays on the single-step path.
    spd = max(int(cfg.get("steps_per_dispatch", 1)), 1)
    chained_step = None
    if awp_warmup is None and spd > 1:
        chained_step = build_chained_train_step(ops, mcfg, opt, mesh=mesh,
                                                donate=True)
    for epoch in range(start_epoch, int(cfg["epochs"])):
        lr = epoch_lr(cfg, epoch)
        bt, dt, losses, top1, top5 = (AverageMeter() for _ in range(5))
        n_batches = len(train_ds) // (batch_size * jax.process_count())
        end = time.time()
        pending = []  # buffered host batches for the chained dispatch

        def flush_chain(state, key):
            xs = np.stack([b[0] for b in pending])
            ys = np.stack([b[1] for b in pending])
            key, k = jax.random.split(key)
            keys = jax.random.split(k, len(pending))
            xb, yb = meshlib.shard_batch_stacked(mesh, (xs, ys))
            state, metrics = chained_step(state, xb, yb, keys,
                                          jnp.float32(lr))
            pending.clear()
            return state, metrics, key

        metrics = None
        for i, (x, y) in enumerate(train_ds.batches(
                batch_size, shuffle=True, seed=seed, epoch=epoch,
                process_index=jax.process_index(),
                process_count=jax.process_count(), as_uint8=True)):
            if limit is not None and i >= limit:
                break
            dt.update(time.time() - end)
            if cfg.get("profile") and epoch == start_epoch and i == 1:
                jax.profiler.start_trace(cfg["profile"])
            if chained_step is not None:
                pending.append((x, y))
                if len(pending) == spd:
                    state, metrics, key = flush_chain(state, key)
            elif awp_warmup is None:
                key, k = jax.random.split(key)
                xb, yb = meshlib.shard_batch(mesh, (x, y))
                state, metrics = train_step(state, xb, yb, k, jnp.float32(lr))
            else:
                # AWP drivers step the LR every minibatch at the fractional
                # epoch (experiments_cifar100_awp.py: adjust_learning_rate_1(
                # optimizer, epoch + (i+1)/len(train_loader), ...))
                key, k = jax.random.split(key)
                xb, yb = meshlib.shard_batch(mesh, (x, y))
                lr_b = epoch_lr(cfg, epoch + (i + 1) / max(n_batches, 1))
                awp_on = jnp.float32(1.0 if epoch >= awp_warmup else 0.0)
                state, metrics = train_step(state, xb, yb, k, jnp.float32(lr_b),
                                            awp_on)
            if cfg.get("profile") and epoch == start_epoch and i == 3:
                jax.device_get(metrics)  # true sync before stopping the trace
                jax.profiler.stop_trace()
                log(f"=> profiler trace written to {cfg['profile']}")
            if i % int(cfg.get("print_freq", 50)) == 0 and metrics is not None:
                m = jax.device_get(metrics)
                losses.update(m["loss"], len(y))
                top1.update(m["top1"], len(y)); top5.update(m["top5"], len(y))
                bt.update(time.time() - end)
                log(train_line(epoch, i, n_batches, bt, dt, losses, top1, top5))
            else:
                bt.update(time.time() - end)
            end = time.time()
        # tail batches shorter than a full chain run one final scan
        if chained_step is not None and pending:
            state, metrics, key = flush_chain(state, key)

        prec1, _ = run_validation(log, eval_step, mesh, state, val_ds, cfg,
                                  num_steps=int(cfg.get("num_steps_1", 10)),
                                  step_size=float(cfg.get("step_size_1", 2 / 255)),
                                  limit=limit)
        is_best = prec1 > best_prec1
        best_prec1 = max(prec1, best_prec1)
        ckpt.save_checkpoint(os.path.join(out_dir, "ckpt"), jax.device_get(state),
                             epoch + 1, cfg["arch"], best_prec1, is_best)
    log(f"=> done. best robust-eval Prec@1 {best_prec1:.3f}")


if __name__ == "__main__":
    main()
