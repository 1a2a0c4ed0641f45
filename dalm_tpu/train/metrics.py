"""Structured metrics/tracking subsystem.

Twin of the reference's tracking (`accelerator.init_trackers` +
``train/loss`` every 100 steps + ``train/epoch_loss``,
`train_rage2e.py:186-200,481-500`) with the same metric names, emitted to:
- a JSONL stream (always, when an output dir is given) — machine-readable
  for the bench harness;
- TensorBoard via tensorboardX (when ``report_to`` includes it and the
  package is present).

Also hosts the step-time profiler hooks the reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping, Optional

import numpy as np


class MetricsLogger:
    def __init__(
        self,
        output_dir: Optional[str] = None,
        project_name: str = "dalm",
        config: Optional[Mapping[str, Any]] = None,
        report_to: str = "all",
        enabled: bool = True,
    ):
        self.enabled = enabled and output_dir is not None
        self._jsonl = None
        self._tb = None
        if not self.enabled:
            return
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(os.path.join(output_dir, f"{project_name}_metrics.jsonl"), "a")
        if config:
            self._write({"event": "config", **_jsonable(config)})
        if report_to in ("all", "tensorboard"):
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "tb", project_name))
            except Exception:
                self._tb = None

    def _write(self, record: dict) -> None:
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()

    def log(self, metrics: Mapping[str, Any], step: int) -> None:
        if not self.enabled:
            return
        record = {"event": "metrics", "step": int(step), "time": time.time()}
        for k, v in metrics.items():
            v = _scalar(v)
            record[k] = v
            if self._tb is not None and isinstance(v, (int, float)):
                self._tb.add_scalar(k, v, step)
        self._write(record)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
            self._jsonl = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None


def _scalar(v: Any) -> Any:
    if hasattr(v, "item"):
        try:
            return v.item()
        except Exception:
            return float(np.asarray(v))
    return v


def _jsonable(d: Mapping[str, Any]) -> dict:
    out = {}
    for k, v in d.items():
        if v is None or isinstance(v, (bool, int, float, str)):
            out[k] = v
        else:
            out[k] = str(v)
    return out


class StepTimer:
    """EMA step-time / throughput meter (new vs reference — SURVEY.md §5)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return dt

    def samples_per_sec(self, batch_size: int) -> float:
        return batch_size / self.avg if self.avg else 0.0


class WindowedThroughput:
    """Throughput meter that never syncs the device itself.

    Per-step host readbacks (``float(loss)``) serialize XLA dispatch, so
    the trainers only read losses back on the logging/epoch cadence. Call
    ``mark(completed_steps)`` immediately *after* each such readback (the
    readback is the synchronization point — on some transports
    ``block_until_ready`` acks before execution finishes) and the meter
    derives sec/step from wall time between marks. The first window is
    dropped from the average when more than one exists (it contains the
    XLA compile).
    """

    def __init__(self):
        self._t0: Optional[float] = None
        self._steps0 = 0
        self.windows: list[tuple[int, float]] = []  # (steps, seconds)

    def mark(self, completed_steps: int) -> None:
        now = time.perf_counter()
        if self._t0 is not None and completed_steps > self._steps0:
            self.windows.append((completed_steps - self._steps0, now - self._t0))
        self._t0, self._steps0 = now, completed_steps

    @property
    def avg(self) -> Optional[float]:
        """Average seconds per step, compile window excluded."""
        w = self.windows[1:] if len(self.windows) > 1 else self.windows
        steps = sum(s for s, _ in w)
        secs = sum(t for _, t in w)
        return secs / steps if steps else None

    def samples_per_sec(self, batch_size: int) -> float:
        a = self.avg
        return batch_size / a if a else 0.0
