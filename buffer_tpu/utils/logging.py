"""Metrics logging and timers.

The reference logs scalars to tensorboardX and prints meters every 200
iterations (``ThreeDMatch/trainer.py:22,66-68,217-223``); tensorboardX is
not available here, so metrics go to a JSONL stream (plus stdout), which
covers the same observability surface.  Timer/AverageMeter mirror
``utils/timer.py:4-55``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.avg = 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average: bool = True) -> float:
        self.diff = time.time() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.avg = self.total_time / self.calls
        return self.avg if average else self.diff


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.sq_sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
        self.sq_sum += val ** 2 * n
        self.var = self.sq_sum / self.count - self.avg ** 2


class MetricLogger:
    """Append-only JSONL metric stream + stdout echo."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, **kv):
        kv = {k: (float(v) if hasattr(v, "__float__") else v)
              for k, v in kv.items()}
        kv["ts"] = time.time()
        line = json.dumps(kv)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.echo:
            print(line, flush=True)
