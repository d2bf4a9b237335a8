"""Metrics meters — parity with /root/reference/utils/utils.py:136-228."""

from __future__ import annotations

from collections import deque

import numpy as np


class AverageMeter:
    """Streaming average + sliding local average (window 5)."""

    def __init__(self, name: str = "null", fmt: str = ":.4f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0
        self.local_history = deque([])
        self.local_avg = 0.0
        self.history = []

    def update(self, val, n: int = 1, history: int = 0, step: int = 5):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        if n == 0:
            return
        self.avg = self.sum / self.count
        if history:
            self.history.append(val)
        if step > 0:
            self.local_history.append(val)
            if len(self.local_history) > step:
                self.local_history.popleft()
            self.local_avg = float(np.average(self.local_history))

    def __len__(self):
        return self.count

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)


class ProgressMeter:
    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.batch_fmtstr = self._get_batch_fmtstr(num_batches)
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        print("\t".join(entries))

    @staticmethod
    def _get_batch_fmtstr(num_batches: int):
        num_digits = len(str(num_batches // 1))
        fmt = "{:" + str(num_digits) + "d}"
        return "[" + fmt + "/" + fmt.format(num_batches) + "]"
