"""Metric accumulators + reference-format logging.

`AverageMeter` matches utils/helper.py:20-36; the log-line formats replicate
the reference drivers' train/validate prints so existing log-scraping
tooling (utils/read_log.py) works unchanged on our logs.
"""

from __future__ import annotations

import os
import time
from typing import Optional


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Logger:
    """print + append to log.txt (reference per-run log dir layout).
    Multihost: only process 0 writes the file (reference rank-0-only
    logging, experiments_imagenet.py:172-180); other hosts still print."""

    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir
        if log_dir:
            try:
                import jax
                rank0 = jax.process_index() == 0
            except Exception:
                rank0 = True
            if rank0:
                os.makedirs(log_dir, exist_ok=True)
                self.path = os.path.join(log_dir, "log.txt")
            else:
                self.path = None
        else:
            self.path = None

    def __call__(self, msg: str):
        print(msg, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                print(msg, file=f)


def train_line(epoch, i, n, batch_time, data_time, losses, top1, top5) -> str:
    return ("Epoch: [{0}][{1}/{2}]\t"
            "Time {bt.val:.3f} ({bt.avg:.3f})\t"
            "Data {dt.val:.3f} ({dt.avg:.3f})\t"
            "Loss {loss.val:.4f} ({loss.avg:.4f})\t"
            "Prec@1 {t1.val:.3f} ({t1.avg:.3f})\t"
            "Prec@5 {t5.val:.3f} ({t5.avg:.3f})\t").format(
        epoch, i, n, bt=batch_time, dt=data_time, loss=losses, t1=top1, t5=top5)


def clean_summary(top1: AverageMeter, top5: AverageMeter) -> str:
    return " * Clean Prec@1 {t1.avg:.3f} Prec@5 {t5.avg:.3f}".format(t1=top1, t5=top5)


def adv_summary(top1: AverageMeter, top5: AverageMeter) -> str:
    return " * Adv Prec@1 {t1.avg:.3f} Prec@5 {t5.avg:.3f}".format(t1=top1, t5=top5)
