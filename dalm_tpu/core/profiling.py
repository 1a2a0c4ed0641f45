"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5 — only tqdm bars). First-class here:
- ``Profiler``: windowed ``jax.profiler`` trace capture (start at step S,
  stop after N steps) writing TensorBoard-viewable traces;
- ``annotate``: named trace regions for host-side phases;
- step-time/throughput metering lives in `dalm_tpu.train.metrics.StepTimer`.
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


class Profiler:
    """Capture a jax.profiler trace for steps [start, start+num)."""

    def __init__(self, output_dir: Optional[str], start_step: int = 10, num_steps: int = 5):
        self.output_dir = output_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self.active = False
        self.done = False

    @property
    def enabled(self) -> bool:
        return self.output_dir is not None

    def maybe_start(self, step: int) -> None:
        if not self.enabled or self.done or self.active or step < self.start_step:
            return
        os.makedirs(self.output_dir, exist_ok=True)
        jax.profiler.start_trace(self.output_dir)
        self.active = True
        logger.info("profiler trace started at step %d -> %s", step, self.output_dir)

    def maybe_stop(self, step: int) -> None:
        if not self.active or step < self.stop_step:
            return
        jax.profiler.stop_trace()
        self.active = False
        self.done = True
        logger.info("profiler trace stopped at step %d", step)

    def close(self) -> None:
        if self.active:
            jax.profiler.stop_trace()
            self.active = False
            self.done = True


@contextlib.contextmanager
def annotate(name: str):
    """Named trace region (shows up in the trace viewer timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield
