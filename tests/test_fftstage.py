"""FFT overlap-save stage tests (engine/fftstage.py).

The reference's FFT stage delegates to polyphase
(/root/reference/stages.go:114-119); this framework implements real
block-FFT evaluation for the long-FIR topologies.  Correctness bar:
equality with engine.oneshot (itself oracle- and scipy-verified) at
float64 machine precision across plans, lengths, and stream counts.
"""

import numpy as np
import pytest

from go_audio_resampler_tpu.engine import plan_engine, oneshot
from go_audio_resampler_tpu.engine.fftstage import (fft_correlate,
                                                    fft_oneshot)
from go_audio_resampler_tpu.filterdesign import Quality

PLANS = [
    (96000, 48000, Quality.HIGH),        # decimate x2
    (96000, 48000, Quality.VERY_HIGH),
    (192000, 48000, Quality.MEDIUM),     # decimate x4
    (48000, 16000, Quality.HIGH),        # decimate x3
    (48000, 96000, Quality.HIGH),        # dft_up x2
    (48000, 192000, Quality.MEDIUM),     # dft_up x4
]


class TestEqualityWithOneshot:
    @pytest.mark.parametrize("inr,outr,q", PLANS)
    def test_matches_oneshot_f64(self, inr, outr, q):
        plan = plan_engine(float(inr), float(outr), q)
        rng = np.random.default_rng(hash((inr, outr, q)) % 2**32)
        x = rng.normal(size=(2, 4096))
        a = np.asarray(oneshot(plan, x, dtype=np.float64))
        b = np.asarray(fft_oneshot(plan, x, dtype=np.float64))
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-11)

    @pytest.mark.parametrize("n", [1, 2, 64, 1000, 4097])
    def test_lengths(self, n):
        plan = plan_engine(96000.0, 48000.0, Quality.HIGH)
        rng = np.random.default_rng(n)
        x = rng.normal(size=(1, n))
        a = np.asarray(oneshot(plan, x, dtype=np.float64))
        b = np.asarray(fft_oneshot(plan, x, dtype=np.float64))
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-11)

    def test_empty(self):
        plan = plan_engine(96000.0, 48000.0, Quality.HIGH)
        y = np.asarray(fft_oneshot(plan, np.zeros((2, 0)),
                                   dtype=np.float64))
        assert y.shape[1] == 0

    def test_float32_tolerance(self):
        plan = plan_engine(96000.0, 48000.0, Quality.HIGH)
        rng = np.random.default_rng(9)
        x = rng.normal(size=(2, 8192)).astype(np.float32)
        a = np.asarray(oneshot(plan, x, dtype=np.float32))
        b = np.asarray(fft_oneshot(plan, x, dtype=np.float32))
        err = np.max(np.abs(a - b)) / np.max(np.abs(a))
        assert err < 1e-5, err

    def test_two_stage_rejected(self):
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        with pytest.raises(ValueError, match="long-FIR"):
            fft_oneshot(plan, np.zeros((1, 100)), dtype=np.float64)


class TestCorrelateCore:
    def test_against_direct_correlation(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 9000))
        h = rng.normal(size=701)
        count = 8000
        f = np.asarray(fft_correlate(np.asarray(x), h, count))
        direct = np.stack([np.correlate(row, h, mode='full')
                           [len(h) - 1:len(h) - 1 + count] for row in x])
        np.testing.assert_allclose(f, direct, rtol=0, atol=1e-10)

    def test_short_input_padded(self):
        # input shorter than one FFT segment: implicit zero pad
        rng = np.random.default_rng(4)
        x = rng.normal(size=(1, 50))
        h = rng.normal(size=11)
        f = np.asarray(fft_correlate(np.asarray(x), h, 50))
        xp = np.pad(x[0], (0, 11))
        direct = np.correlate(xp, h, mode='full')[10:60]
        np.testing.assert_allclose(f[0], direct, rtol=0, atol=1e-12)
