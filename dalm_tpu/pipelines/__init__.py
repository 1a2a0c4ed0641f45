"""Composite pipelines (reference L5, `/root/reference/dalm/pipelines/`)."""

from dalm_tpu.pipelines.reading_comprehension import (
    LLMKwargs,
    SynthKwargs,
    SynthMode,
    pipeline,
)

__all__ = ["LLMKwargs", "SynthKwargs", "SynthMode", "pipeline"]
