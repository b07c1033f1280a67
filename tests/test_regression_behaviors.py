"""Behavioral regression pins: DC gain, amplitude, clipping, zero input,
multitone imaging.

Mirrors the reference's regression_test.go (TestRegressionDCGain:12-66,
TestRegressionSineAmplitude:69-128, TestRegressionNoClipping:130-159,
TestRegressionZeroInput:160-186) and the peak-based multitone imaging
measure of multitone_debug_test.go:157-220, on the direct engine path the
reference uses for those tests (NewResampler -> Process + Flush).
"""

import numpy as np
import pytest

from go_audio_resampler_tpu import convenience
from go_audio_resampler_tpu.api import QualityPreset
from go_audio_resampler_tpu.utils import signals

RATIO_CASES = [(44100, 48000), (48000, 44100), (44100, 96000),
               (96000, 48000)]


def _oneshot(x, inr, outr, quality=QualityPreset.HIGH):
    return np.asarray(convenience.resample_mono(
        np.asarray(x, np.float64), inr, outr, quality))


class TestRegressionDCGain:
    @pytest.mark.parametrize("inr,outr", RATIO_CASES)
    def test_dc_gain_near_unity(self, inr, outr):
        y = _oneshot(np.ones(10000), inr, outr)
        mid = y[len(y) // 4: 3 * len(y) // 4]
        dc = float(np.mean(mid))
        assert abs(dc - 1.0) <= 0.001, dc


class TestRegressionSineAmplitude:
    @pytest.mark.parametrize("inr,outr", RATIO_CASES)
    def test_amplitude_preserved(self, inr, outr):
        x = signals.sine(20000, 1000.0, inr, amplitude=0.5)
        y = _oneshot(x, inr, outr)
        mid = y[len(y) // 4: 3 * len(y) // 4]
        amp = np.sqrt(np.mean(mid ** 2)) * np.sqrt(2.0)
        assert abs(amp - 0.5) / 0.5 <= 0.01, amp


class TestRegressionNoClipping:
    def test_full_scale_sine_bounded(self):
        x = signals.sine(10000, 1000.0, 44100, amplitude=1.0)
        y = _oneshot(x, 44100, 48000)
        # The reference checks Process output only (no flush), so its
        # trailing-edge Gibbs ringing is excluded; our one-shot includes
        # the flushed tail — exclude the final filter ramp likewise.
        # Small overshoot from ringing allowed (reference bound: 1.1).
        body = y[:-200]
        assert np.abs(body).max() <= 1.1, np.abs(body).max()


class TestRegressionZeroInput:
    @pytest.mark.parametrize("inr,outr", RATIO_CASES)
    def test_zero_in_zero_out(self, inr, outr):
        y = _oneshot(np.zeros(10000), inr, outr)
        assert np.abs(y).max() <= 1e-10


class TestMultitoneImaging:
    """Peak-based imaging attenuation for 2x upsampling: the strongest
    spectral image above the input Nyquist must sit >= 90 dB below the
    strongest passband tone (multitone_debug_test.go:157-220)."""

    def _psd_db(self, y, rate, nfft=16384):
        w = np.hanning(nfft)
        n_seg = len(y) // nfft
        acc = np.zeros(nfft // 2)
        for k in range(n_seg):
            seg = y[k * nfft:(k + 1) * nfft] * w
            acc += np.abs(np.fft.fft(seg)[:nfft // 2]) ** 2
        psd = acc / max(n_seg, 1)
        freqs = np.arange(nfft // 2) * rate / nfft
        return freqs, 10.0 * np.log10(psd + 1e-30)

    def test_peak_imaging_attenuation_2x_up(self):
        inr, outr = 48000.0, 96000.0
        tones = [1000.0, 3000.0, 7000.0, 11000.0, 17000.0, 20000.0]
        x = signals.multitone(65536, tones, inr, amplitude=0.1)
        y = _oneshot(x, inr, outr)
        y = y[len(y) // 8: -len(y) // 8]           # steady state
        freqs, psd = self._psd_db(y, outr)
        passband = (freqs >= 100) & (freqs < inr / 2 * 0.9)
        stopband = (freqs >= inr / 2 + 1000) & (freqs <= outr / 2 - 1000)
        pass_peak = psd[passband].max()
        stop_peak = psd[stopband].max()
        atten = pass_peak - stop_peak
        assert atten >= 90.0, atten


class TestPrestageBankInvariant:
    """Each polyphase phase of the 2x prestage bank must have unit DC
    gain (the analog of the reference's per-phase DC normalization,
    filter_params.go:250-267; analyze-filter's check)."""

    @pytest.mark.parametrize("q", ["LOW", "HIGH", "VERY_HIGH"])
    def test_phase_dc_gains(self, q):
        from go_audio_resampler_tpu.engine import plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        plan = plan_engine(44100.0, 48000.0, getattr(Quality, q))
        assert plan.pre_coeffs is not None
        sums = plan.pre_coeffs.sum(axis=1)
        np.testing.assert_allclose(sums, 1.0, atol=5e-4)
