"""Cross-preset quality comparison and custom-precision configurations.

Counterpart of the reference's quality_comparison_test.go and
quality_presets_test.go tiers: verify the quality ladder is monotone
(higher presets achieve at least the THD class of lower ones) and that
fine-grained custom precisions build working pipelines.
"""

import numpy as np
import pytest

import go_audio_resampler_tpu as gar
from go_audio_resampler_tpu.engine import plan_engine, oneshot
from go_audio_resampler_tpu.filterdesign import Quality
from go_audio_resampler_tpu.utils import metrics, signals

N = 65536
FFT = 16384


def thd_for(q: Quality, freq=1000.0, inr=44100, outr=48000) -> float:
    x = signals.sine(N, freq, inr)
    plan = plan_engine(inr, outr, q)
    y = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
    return metrics.thd(y, outr, freq, FFT)


class TestQualityLadder:
    def test_thd_improves_with_quality(self):
        # Cubic interpolation error grows as (f/fs)^4, so the ladder is
        # visible at high frequency (at 1 kHz even Quick measures clean —
        # harmonic THD there reflects only the gentle cubic bias).
        thd_quick = thd_for(Quality.QUICK, 10000.0)
        thd_low = thd_for(Quality.LOW, 10000.0)
        thd_high = thd_for(Quality.HIGH, 10000.0)
        # Quick (cubic) is far worse than the filtered presets at 10 kHz
        assert thd_quick > thd_low + 20
        # High must be at least Low's class (allow small measurement slack)
        assert thd_high <= thd_low + 5

    # Full preset x ratio THD matrix at 1 kHz (quality_comparison_test.go
    # analog).  Floors = measured values minus ~6 dB margin; the 44.1<->48
    # column reproduces the reference's README table (-142.3 Low,
    # -129.8 Medium, -155.6 High, -162.2 VHQ) to the decimal.
    THD_MATRIX = {
        (44100, 48000): {Quality.QUICK: -146, Quality.LOW: -136,
                         Quality.MEDIUM: -123, Quality.HIGH: -149,
                         Quality.VERY_HIGH: -156},
        (48000, 44100): {Quality.QUICK: -145, Quality.LOW: -136,
                         Quality.MEDIUM: -144, Quality.HIGH: -157,
                         Quality.VERY_HIGH: -156},
        (32000, 48000): {Quality.QUICK: -156, Quality.LOW: -155,
                         Quality.MEDIUM: -155, Quality.HIGH: -156,
                         Quality.VERY_HIGH: -156},
        (48000, 32000): {Quality.QUICK: -187, Quality.LOW: -187,
                         Quality.MEDIUM: -187, Quality.HIGH: -187,
                         Quality.VERY_HIGH: -186},
        (96000, 48000): {Quality.QUICK: -156, Quality.LOW: -155,
                         Quality.MEDIUM: -156, Quality.HIGH: -156,
                         Quality.VERY_HIGH: -156},
        (48000, 96000): {Quality.QUICK: -136, Quality.LOW: -136,
                         Quality.MEDIUM: -136, Quality.HIGH: -136,
                         Quality.VERY_HIGH: -137},
        (22050, 48000): {Quality.QUICK: -134, Quality.LOW: -133,
                         Quality.MEDIUM: -141, Quality.HIGH: -155,
                         Quality.VERY_HIGH: -155},
        (44100, 96000): {Quality.QUICK: -137, Quality.LOW: -133,
                         Quality.MEDIUM: -135, Quality.HIGH: -136,
                         Quality.VERY_HIGH: -137},
    }

    @pytest.mark.parametrize("inr,outr", sorted(THD_MATRIX))
    @pytest.mark.parametrize("q", [Quality.QUICK, Quality.LOW,
                                   Quality.MEDIUM, Quality.HIGH,
                                   Quality.VERY_HIGH])
    def test_thd_matrix(self, inr, outr, q):
        val = thd_for(q, 1000.0, inr, outr)
        floor = self.THD_MATRIX[(inr, outr)][q]
        assert val <= floor, \
            f"{q.name} {inr}->{outr}: THD {val:.1f} dB above floor {floor}"

    def test_filter_size_grows_with_quality(self):
        taps = [plan_engine(44100, 48000, q).filter_length()
                for q in (Quality.LOW, Quality.HIGH, Quality.VERY_HIGH)]
        assert taps[0] < taps[1] < taps[2]

    def test_fine_grained_bit_presets(self):
        # Quality16Bit..32Bit fine-control presets (filter_params.go:31-41)
        for q in (Quality.BITS_16, Quality.BITS_20, Quality.BITS_24,
                  Quality.BITS_28, Quality.BITS_32):
            plan = plan_engine(44100, 48000, q)
            y = np.asarray(oneshot(plan, signals.sine(2000, 997.0, 44100)[None],
                                   dtype=np.float64))
            assert np.all(np.isfinite(y))


class TestCustomQualitySpec:
    def test_custom_preset_via_public_api(self):
        spec = gar.QualitySpec(preset=gar.QualityPreset.CUSTOM, precision=20,
                               phase_response=50.0, passband_end=0.9,
                               stopband_begin=0.98)
        r = gar.new_resampler(gar.Config(44100, 48000, quality=spec))
        x = signals.sine(4000, 1000.0, 44100)
        y = np.concatenate([r.process(x), r.flush()])
        assert np.all(np.isfinite(y))
        assert len(y) > 4000

    def test_custom_precision_drives_stage_quality(self):
        eq = gar.precision_to_engine_quality
        spec_hi = gar.QualitySpec(preset=gar.QualityPreset.CUSTOM,
                                  precision=28, passband_end=0.9,
                                  stopband_begin=0.98)
        spec_lo = gar.QualitySpec(preset=gar.QualityPreset.CUSTOM,
                                  precision=16, passband_end=0.9,
                                  stopband_begin=0.98)
        r_hi = gar.new_resampler(gar.Config(44100, 48000, quality=spec_hi))
        r_lo = gar.new_resampler(gar.Config(44100, 48000, quality=spec_lo))
        assert (r_hi.get_info().filter_length
                > r_lo.get_info().filter_length)

    def test_allow_aliasing_flag_accepted(self):
        spec = gar.QualitySpec(preset=gar.QualityPreset.CUSTOM, precision=20,
                               passband_end=0.9, stopband_begin=0.98,
                               flags=gar.QualityFlags.ALLOW_ALIASING)
        r = gar.new_resampler(gar.Config(48000, 44100, quality=spec))
        assert r.get_ratio() == pytest.approx(44100 / 48000)


class TestLatencyModel:
    def test_latency_scales_with_quality(self):
        lat = [plan_engine(44100, 48000, q).latency()
               for q in (Quality.LOW, Quality.HIGH, Quality.VERY_HIGH)]
        assert lat[0] < lat[1] < lat[2]

    def test_quick_latency_small(self):
        assert plan_engine(44100, 48000, Quality.QUICK).latency() == 2

    def test_decimation_latency(self):
        plan = plan_engine(96000, 48000, Quality.HIGH)
        assert plan.latency() == plan.decim_taps // 2
