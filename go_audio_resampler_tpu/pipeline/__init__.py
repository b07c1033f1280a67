"""Pipeline planning and inter-stage plumbing."""

from .planner import (
    StageType, StageSpec, QualityParams, Pipeline, PipelineError,
    build_pipeline, optimize_pipeline, should_use_fft,
    calculate_half_band_taps, calculate_polyphase_taps,
    calculate_polyphase_phases, calculate_cutoff_factor,
    calculate_interpolation_order, calculate_fft_size,
    COMMON_AUDIO_RATIOS,
)
from .buffer import SampleFIFO

__all__ = [
    "StageType", "StageSpec", "QualityParams", "Pipeline", "PipelineError",
    "build_pipeline", "optimize_pipeline", "should_use_fft",
    "calculate_half_band_taps", "calculate_polyphase_taps",
    "calculate_polyphase_phases", "calculate_cutoff_factor",
    "calculate_interpolation_order", "calculate_fft_size",
    "COMMON_AUDIO_RATIOS", "SampleFIFO",
]
