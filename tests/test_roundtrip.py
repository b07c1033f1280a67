"""End-to-end round-trip reconstruction: up then down preserves the signal.

A passband-limited signal converted 44.1k -> 48k -> 44.1k must come back
with its spectrum intact.  The cascade's net group delay is generally a
*fractional* number of samples, so the comparison is done by least-squares
fitting the known tones (exact regardless of FFT bin alignment): fitted
amplitudes must match the input and the fit residual (everything that is
not the tones: distortion + noise) must be far down.  This exercises the
full chain — filter design, both topologies, flush — against an absolute
ground truth independent of any golden data.
"""

import numpy as np
import pytest

from go_audio_resampler_tpu.engine import plan_engine, oneshot
from go_audio_resampler_tpu.filterdesign import Quality
from go_audio_resampler_tpu.utils import signals


def roundtrip(x, a, b, q):
    up = plan_engine(a, b, q)
    down = plan_engine(b, a, q)
    mid = oneshot(up, np.asarray(x)[None], dtype=np.float64)
    return np.asarray(oneshot(down, np.asarray(mid), dtype=np.float64))[0]


def fit_tones(y, freqs, rate, start=2000, length=16384):
    """LS-fit amplitudes of known tones; returns (amps, residual_rms)."""
    seg = y[start:start + length]
    t = np.arange(len(seg)) / rate
    cols = []
    for f in freqs:
        cols.append(np.sin(2 * np.pi * f * t))
        cols.append(np.cos(2 * np.pi * f * t))
    A = np.stack(cols, axis=1)
    coef, *_ = np.linalg.lstsq(A, seg, rcond=None)
    amps = np.hypot(coef[0::2], coef[1::2])
    resid = seg - A @ coef
    return amps, float(np.sqrt(np.mean(resid ** 2)))


class TestRoundTrip:
    @pytest.mark.parametrize("a,b", [(44100, 48000), (48000, 96000),
                                     (32000, 48000)])
    def test_sine_reconstruction_high(self, a, b):
        x = signals.sine(32768, 1000.0, a)
        back = roundtrip(x, a, b, Quality.HIGH)
        amps, resid = fit_tones(back, [1000.0], a)
        assert amps[0] == pytest.approx(0.9, rel=0.01)
        # residual (distortion + noise) at least 80 dB below the tone
        assert resid < 0.9 * 1e-4, f"residual rms {resid:.2e}"

    def test_multitone_amplitudes_vhq(self):
        a, b = 44100, 48000
        x, freqs = signals.passband_tones(32768, a, b)
        back = roundtrip(x, a, b, Quality.VERY_HIGH)
        amps, resid = fit_tones(back, freqs, a)
        np.testing.assert_allclose(amps, 0.05, rtol=0.12)
        assert resid < 1e-3

    def test_quick_preserves_tone(self):
        a, b = 44100, 48000
        x = signals.sine(16384, 1000.0, a)
        back = roundtrip(x, a, b, Quality.QUICK)
        amps, resid = fit_tones(back, [1000.0], a, start=1000, length=8192)
        assert amps[0] == pytest.approx(0.9, rel=0.05)
        assert resid < 0.05
