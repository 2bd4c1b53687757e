"""Run logging: CSV (cks/logs layout, pl.CSVLogger-like) + optional wandb.

wandb is gated: the reference logs to projects Heart-Sound-Analysis{,-FT,-PT,
-CV} (linear_eval.py:1491-1512 etc.); here it activates only when wandb is
importable AND WANDB_API_KEY/WANDB_MODE is configured, else no-ops.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Optional


class CSVLogger:
    def __init__(self, save_dir: str, name: str, version: Optional[str] = None):
        self.dir = os.path.join(save_dir, name, version or "")
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "metrics.csv")
        self._fields = None

    def log(self, **metrics):
        write_header = self._fields is None and not os.path.exists(self.path)
        if self._fields is None:
            self._fields = ["step_time"] + sorted(metrics.keys())
        row = {"step_time": time.time(), **metrics}
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fields, extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow(row)


class WandbLogger:
    def __init__(self, project: str, name: str, config: Optional[dict] = None):
        self._run = None
        if os.environ.get("WANDB_API_KEY") or os.environ.get("WANDB_MODE") == "offline":
            try:
                import wandb

                self._run = wandb.init(project=project, name=name, config=config or {})
            except Exception:
                self._run = None

    def log(self, metrics: dict):
        if self._run is not None:
            self._run.log(metrics)

    def finish(self):
        if self._run is not None:
            self._run.finish()


def get_run_name(title: str) -> str:
    s = time.gmtime(time.time())
    return f"{time.strftime('%Y-%m-%d %H:%M:%S', s)}-{title}"
