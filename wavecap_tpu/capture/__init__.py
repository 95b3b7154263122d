"""Capture runtime: block pipeline + host streaming engine."""

from .engine import (
    Capture,
    CaptureConfig,
    CaptureManager,
    ChannelSpec,
    ChannelHandle,
)
from .pipeline import (
    CapturePipelineConfig,
    CaptureState,
    CaptureControl,
    capture_step,
    pipeline_init,
    control_init,
    jit_capture_step,
)

__all__ = [n for n in dir() if not n.startswith("_")]
