"""Utilities: test-signal synthesis, DSP quality metrics, WAV I/O."""

from . import metrics, signals

__all__ = ["metrics", "signals"]
