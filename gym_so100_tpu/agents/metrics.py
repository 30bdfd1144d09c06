"""Metric sinks: stdout JSON lines + TensorBoard event files.

The reference configures SB3's logger for ["tensorboard", "stdout"]
(/root/reference/scripts/train_sac.py:323, train_sac_her.py:234) and records
eval/mean_reward + eval/timesteps (train_sac.py:97-98).  This module is the
equivalent sink for the trainers' `progress` callbacks: every dict line goes
to stdout as JSON, and numeric fields become TensorBoard scalars under the
same keys, stepped by "env_steps" (or "eval_at" for eval lines).

TensorBoard writing is optional — if no writer backend is importable the
logger degrades to stdout-only without failing (this image ships
torch.utils.tensorboard, so TB is normally live).
"""

from __future__ import annotations

import json


class MetricLogger:
    """Callable progress sink: MetricLogger(logdir)(line_dict).

    line_dict: {"env_steps": int, "mean_reward": float, ...} or
    {"eval_at": int, "eval_mean_return": float, ...}.
    """

    def __init__(self, logdir=None, stdout=True):
        self.stdout = stdout
        self._tb = None
        if logdir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=logdir)
            except Exception as e:  # pragma: no cover - env without torch TB
                print(f"[metrics] tensorboard unavailable ({e}); stdout only")

    def __call__(self, line: dict):
        if self.stdout:
            print(json.dumps(line), flush=True)
        if self._tb is None:
            return
        step = line.get("env_steps", line.get("eval_at"))
        if step is None:
            return
        for k, v in line.items():
            if k in ("env_steps", "eval_at"):
                continue
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                continue
            self._tb.add_scalar(k, float(v), int(step))
        self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
