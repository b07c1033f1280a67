"""Same-machine throughput A/B against the independent implementation.

The reference benchmarks itself against live libsoxr on the same machine
(throughput_comparison_test.go:25-305) and reports MS/s for both.  The
environment-feasible analog here is scipy.signal.resample_poly on the CPU
backend: both run the same workload on the same machine in the same
process, and the framework must stay within an order of magnitude of the
C implementation even on its non-native backend (on TPU it is ~3 orders
faster; this tier exists to catch pathological CPU regressions and to
keep an honest same-machine number in the test log).
"""

import time

import numpy as np
import pytest

scipy_signal = pytest.importorskip("scipy.signal")

from go_audio_resampler_tpu.engine import plan_engine, oneshot
from go_audio_resampler_tpu.filterdesign import Quality

N = 1 << 16


def _best_of(fn, iters=5):
    fn()  # warm-up / compile
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


class TestThroughputComparison:
    @pytest.mark.parametrize("inr,outr,up,down", [
        (44100, 48000, 160, 147),
        (96000, 48000, 1, 2),
    ])
    def test_cpu_ab_vs_scipy_resample_poly(self, inr, outr, up, down):
        plan = plan_engine(float(inr), float(outr), Quality.HIGH)
        x = (np.random.default_rng(0).normal(size=N) * 0.5)
        xb = x[None, :]

        def ours():
            return np.asarray(oneshot(plan, xb, dtype=np.float64))

        def theirs():
            return scipy_signal.resample_poly(x, up, down)

        t_ours = _best_of(ours)
        t_scipy = _best_of(theirs)
        ours_msps = N / t_ours / 1e6
        scipy_msps = N / t_scipy / 1e6
        print(f"\n  {inr}->{outr}: ours {ours_msps:.1f} MS/s vs "
              f"scipy.resample_poly {scipy_msps:.1f} MS/s "
              f"(ratio {ours_msps / scipy_msps:.2f}x, CPU backend)")
        # Sanity floor only: the CPU backend is the parity path, not the
        # product path (XLA:CPU runs the f64 banded matmuls ~20x slower
        # than scipy's C polyphase loop; the TPU product path is ~250x
        # FASTER than scipy — benchmarks/results.json).  A 30x-slower
        # result signals something structurally broken (e.g. re-tracing
        # per call).
        assert ours_msps > scipy_msps / 30.0

    def test_values_comparable_where_filters_overlap(self):
        # The A/B is meaningful because both compute the same resampling
        # (to within their different filter designs): mid-band tone
        # amplitude agrees within 0.1 dB.
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        t = np.arange(N) / 44100.0
        x = np.sin(2 * np.pi * 1000.0 * t)
        a = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
        b = scipy_signal.resample_poly(x, 160, 147)
        mid_a = a[len(a) // 4: -len(a) // 4]
        mid_b = b[len(b) // 4: -len(b) // 4]
        ra = np.sqrt(np.mean(mid_a ** 2))
        rb = np.sqrt(np.mean(mid_b ** 2))
        assert abs(20 * np.log10(ra / rb)) < 0.1
