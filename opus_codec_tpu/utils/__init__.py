"""Utility subsystems: profiling/observability harness."""

from .profiling import StageTimer, device_trace

__all__ = ["StageTimer", "device_trace"]
