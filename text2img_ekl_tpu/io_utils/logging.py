"""Metrics logging: TensorBoard events when available, JSONL always.

The reference logs scalars every 100 iters through tensorboardX
(cub_trainer_splitz_cap_ca.py:18-19, 458-460) plus stdout epoch summaries.
Here every scalar goes to a JSONL stream (machine-readable, survives
without TB) and mirrored to TensorBoard if tensorboardX/tensorboard is
importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, 'metrics.jsonl'), 'a')
        self.tb = None
        try:
            from tensorboardX import SummaryWriter
            self.tb = SummaryWriter(log_dir)
        except Exception:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(log_dir)
            except Exception:
                self.tb = None

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {'step': int(step), 'time': time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self.jsonl.write(json.dumps(rec) + '\n')
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), int(step))

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
