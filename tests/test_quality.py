"""DSP quality regression tests with hard thresholds.

Port of the reference's quality regression tier (SURVEY.md section 4.2):
synthesize DC/sine/multitone/alias-tone signals, resample through the
engine in float64, measure THD / SNR / ripple / anti-aliasing / DC gain,
and assert the calibrated floors from
internal/engine/quality_regression_test.go:26-58 ("only made stricter,
never relaxed").  Also compares against the captured libsoxr golden data
(tests/testdata/soxr_reference_data.json).
"""

import json
import pathlib

import numpy as np
import pytest

from go_audio_resampler_tpu.engine import plan_engine, oneshot
from go_audio_resampler_tpu.filterdesign import Quality
from go_audio_resampler_tpu.utils import metrics, signals

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "testdata" / "soxr_reference_data.json")
    .read_text())

NUM_SAMPLES = 65536
FFT_SIZE = 16384

# Regression floors (quality_regression_test.go:26-58)
MAX_THD = {
    Quality.QUICK: -80.0,
    Quality.LOW: -130.0,
    Quality.MEDIUM: -129.0,
    Quality.HIGH: -140.0,
    Quality.VERY_HIGH: -140.0,
}
MAX_RIPPLE = {
    Quality.QUICK: 5.5,
    Quality.LOW: 2.0,
    Quality.MEDIUM: 2.0,
    Quality.HIGH: 2.0,
    Quality.VERY_HIGH: 2.0,
}
MIN_SNR = 35.0
DC_TOL = 0.001


def resample(x, inr, outr, q):
    plan = plan_engine(inr, outr, q)
    return np.asarray(oneshot(plan, np.asarray(x)[None], dtype=np.float64))[0]


class TestTHDRegression:
    CASES = [(44100, 48000), (48000, 44100), (48000, 96000), (96000, 48000),
             (48000, 32000)]

    @pytest.mark.parametrize("inr,outr", CASES)
    @pytest.mark.parametrize("q", [Quality.QUICK, Quality.LOW, Quality.MEDIUM,
                                   Quality.HIGH, Quality.VERY_HIGH])
    def test_thd_1khz(self, inr, outr, q):
        x = signals.sine(NUM_SAMPLES, 1000.0, inr)
        y = resample(x, inr, outr, q)
        val = metrics.thd(y, outr, 1000.0, FFT_SIZE)
        assert val <= MAX_THD[q], f"THD {val:.2f} dB above floor {MAX_THD[q]}"

    def test_thd_vs_soxr_golden(self):
        # soxr capture: thd_44100_48000_1000 = -162.223 dB; the Go
        # reference reaches -162.19 (README.md:308) and the f64 path
        # here measures -162.189 at this FFT_SIZE — +0.034 dB from the
        # golden, inside the BASELINE.md north-star band ("within
        # 0.1 dB"), which is pinned as the assertion.  (At FFT_SIZE
        # 32768 the same output measures -178.6 dB: the figure is
        # window-noise-floor-bound, not filter-bound.)
        x = signals.sine(NUM_SAMPLES, 1000.0, 44100)
        y = resample(x, 44100, 48000, Quality.VERY_HIGH)
        val = metrics.thd(y, 48000, 1000.0, FFT_SIZE)
        golden = GOLDEN["quality"]["thd_44100_48000_1000"]["thd_db"]
        assert val <= golden + 0.1, \
            f"VHQ THD {val:.2f} dB vs soxr {golden:.2f} (+0.1 dB band)"


class TestSNRRegression:
    @pytest.mark.parametrize("inr,outr", [(44100, 48000), (48000, 44100),
                                          (96000, 48000), (48000, 32000)])
    @pytest.mark.parametrize("q", [Quality.LOW, Quality.HIGH,
                                   Quality.VERY_HIGH])
    def test_snr_floor(self, inr, outr, q):
        x = signals.sine(NUM_SAMPLES, 1000.0, inr)
        y = resample(x, inr, outr, q)
        val = metrics.snr(y, outr, 1000.0, FFT_SIZE)
        assert val >= MIN_SNR, f"SNR {val:.2f} dB below {MIN_SNR}"


class TestPassbandRipple:
    CASES = [(44100, 48000), (48000, 44100), (48000, 96000), (96000, 48000),
             (48000, 32000)]

    @pytest.mark.parametrize("inr,outr", CASES)
    @pytest.mark.parametrize("q", [Quality.HIGH, Quality.VERY_HIGH])
    def test_ripple(self, inr, outr, q):
        x, freqs = signals.passband_tones(NUM_SAMPLES, inr, outr)
        y = resample(x, inr, outr, q)
        r = metrics.passband_ripple(y, outr, freqs, FFT_SIZE)
        assert r.ripple_peak_peak <= MAX_RIPPLE[q], \
            f"ripple {r.ripple_peak_peak:.2f} dB > {MAX_RIPPLE[q]}"

    def test_ripple_vs_soxr_golden(self):
        # soxr: ripple_44100_48000 = 1.3238 dB p-p; match within 1 dB
        x, freqs = signals.passband_tones(NUM_SAMPLES, 44100, 48000)
        y = resample(x, 44100, 48000, Quality.VERY_HIGH)
        r = metrics.passband_ripple(y, 48000, freqs, FFT_SIZE)
        golden = GOLDEN["quality"]["ripple_44100_48000"]["ripple"]
        assert abs(r.ripple_peak_peak - golden) <= 1.0, \
            f"ripple {r.ripple_peak_peak:.3f} vs soxr {golden:.3f}"


class TestDCGain:
    # quality_regression_test.go:59-103
    CASES = [(44100, 48000, Quality.VERY_HIGH), (48000, 44100, Quality.VERY_HIGH),
             (48000, 32000, Quality.VERY_HIGH), (48000, 96000, Quality.VERY_HIGH),
             (44100, 48000, Quality.QUICK), (48000, 32000, Quality.QUICK)]

    @pytest.mark.parametrize("inr,outr,q", CASES)
    def test_dc_gain(self, inr, outr, q):
        x = signals.dc(16384)
        y = resample(x, inr, outr, q)
        g = metrics.dc_gain(y)
        assert abs(g - 1.0) <= DC_TOL, f"DC gain {g:.6f} outside +-{DC_TOL}"


def steady_state_attenuation(inr, outr, q):
    """Alias attenuation with the convolution ramp and flush tail trimmed.

    The untrimmed measurement conflates the filter's alias rejection with
    the truncation splatter of the finite test signal (the flush step's
    band-limited ringing near the cutoff) — demonstrably: a 47 dB deeper
    VHQ filter measures *worse* untrimmed than HIGH.  Trimming isolates the
    filter property the libsoxr capture reflects.
    """
    plan = plan_engine(inr, outr, q)
    x = signals.alias_tones(NUM_SAMPLES, inr, outr)
    y = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
    tr = max(plan.decim_taps // plan.factor, 2048)
    yt = y[tr:-tr]
    assert len(yt) >= 8192
    return metrics.antialias_attenuation(x, yt, inr, outr)


class TestAntiAliasing:
    def test_integer_decimation_attenuation(self):
        # Untrimmed floor: exceeds the reference's 80 dB
        # (antialiasing_test.go:27) with margin; the value is splatter-
        # limited (see steady_state_attenuation), not filter-limited.
        x = signals.alias_tones(NUM_SAMPLES, 96000, 48000)
        y = resample(x, 96000, 48000, Quality.VERY_HIGH)
        att = metrics.antialias_attenuation(x, y, 96000, 48000)
        assert att >= 105.0, f"anti-alias attenuation {att:.1f} dB < 105"

    @pytest.mark.parametrize("inr,outr,q,floor", [
        (96000, 48000, Quality.HIGH, 160.0),
        (96000, 48000, Quality.VERY_HIGH, 180.0),
        (48000, 16000, Quality.HIGH, 165.0),
        (48000, 16000, Quality.VERY_HIGH, 185.0),
        (192000, 48000, Quality.HIGH, 160.0),
        (192000, 48000, Quality.VERY_HIGH, 178.0),
    ])
    def test_integer_decimation_steady_state(self, inr, outr, q, floor):
        # Beyond-reference decimation depth (DECIM_ATTENUATION_FLOOR_DB):
        # steady-state alias rejection at HIGH+ beats the libsoxr capture
        # (157.14 dB at 96k->48k) on every integer decimation.
        att = steady_state_attenuation(inr, outr, q)
        assert att >= floor, f"steady-state attenuation {att:.1f} dB < {floor}"

    def test_decimation_vs_soxr_golden(self):
        # Golden-capture comparison: beat libsoxr's measured 96k->48k alias
        # rejection (soxr_reference_data.json) by >= 10 dB in steady state.
        golden = GOLDEN["antialiasing"]["96000_48000_alias_tones"]
        att = steady_state_attenuation(96000, 48000, Quality.VERY_HIGH)
        assert att >= golden + 10.0, \
            f"steady-state {att:.1f} dB vs soxr capture {golden:.2f}"

    @pytest.mark.parametrize("inr,outr", [(48000, 32000), (48000, 44100)])
    def test_noninteger_downsampling_informational(self, inr, outr):
        # The reference explicitly treats non-integer downsampling alias
        # attenuation as informational — the polyphase path's stopband is
        # limited (antialiasing_test.go:727-737).  Assert only that the
        # measurement is finite and the pipeline runs; the value tracks the
        # reference's behavior, not libsoxr's.
        x = signals.alias_tones(NUM_SAMPLES, inr, outr)
        y = resample(x, inr, outr, Quality.VERY_HIGH)
        att = metrics.antialias_attenuation(x, y, inr, outr)
        assert np.isfinite(att)

    @pytest.mark.parametrize("inr,outr,floor", [
        (48000, 32000, 95.0), (48000, 44100, 85.0)])
    def test_public_api_auto_strict_default(self, inr, outr, floor):
        # Beyond-reference default: through the public API at High
        # precision, non-integer downsampling engages the strict
        # anti-alias prefilter automatically (Config.strict_antialias
        # defaults to None = auto), so the informational ~0-10 dB
        # reference behavior becomes real stopband rejection.
        import go_audio_resampler_tpu as gar
        x = signals.alias_tones(NUM_SAMPLES, inr, outr)
        r = gar.new_resampler(gar.Config(
            inr, outr, quality=gar.get_preset_spec(gar.QualityPreset.HIGH),
            dtype=np.float64))
        y = np.concatenate([r.process(x), r.flush()])
        tr = 4096
        att = metrics.antialias_attenuation(x, y[tr:-tr], inr, outr)
        assert att >= floor, f"auto-strict attenuation {att:.1f} dB < {floor}"

    def test_public_api_opt_outs_disable_auto_strict(self):
        # ALLOW_ALIASING or strict_antialias=False restores the
        # reference-parity path: no prefilter, so the above-Nyquist tones
        # fold through nearly unattenuated (the reference's informational
        # ~0-10 dB behavior) instead of the auto-strict 85+ dB.
        import go_audio_resampler_tpu as gar
        spec = gar.get_preset_spec(gar.QualityPreset.HIGH)
        spec = gar.QualitySpec(preset=spec.preset, precision=spec.precision,
                               phase_response=spec.phase_response,
                               passband_end=spec.passband_end,
                               stopband_begin=spec.stopband_begin,
                               flags=gar.QualityFlags.ALLOW_ALIASING)
        x = signals.alias_tones(NUM_SAMPLES, 48000, 44100)
        for cfg in [
            gar.Config(48000, 44100, quality=spec, dtype=np.float64),
            gar.Config(48000, 44100,
                       quality=gar.get_preset_spec(gar.QualityPreset.HIGH),
                       strict_antialias=False, dtype=np.float64),
        ]:
            r = gar.new_resampler(cfg)
            y = np.concatenate([r.process(x), r.flush()])
            att = metrics.antialias_attenuation(x, y[4096:-4096],
                                                48000, 44100)
            assert att < 50.0, f"opt-out still filtering: {att:.1f} dB"


class TestImpulseAndSymmetry:
    def test_impulse_finite_and_concentrated(self):
        # testutil helpers.go:25-39 analog: finite values; linear-phase
        # filtering keeps the impulse energy concentrated around one peak.
        # (Exact symmetry does not apply: the polyphase output grid samples
        # the continuous response at non-symmetric phases.)
        x = signals.impulse(4096, position=2048)
        y = resample(x, 44100, 48000, Quality.HIGH)
        assert np.all(np.isfinite(y))
        peak = int(np.argmax(np.abs(y)))
        total = float(np.sum(y ** 2))
        near = float(np.sum(y[peak - 300:peak + 300] ** 2))
        assert near / total > 0.999
        # Energy scales with the rate change (Parseval: ~ratio x band factor)
        assert 0.9 < total < 48000 / 44100 + 0.01

    def test_extreme_values_no_nan(self):
        for scale in (1e-30, 1.0, 1e6):
            x = signals.sine(4096, 1000.0, 44100) * scale
            y = resample(x, 44100, 48000, Quality.HIGH)
            assert np.all(np.isfinite(y))

    def test_sine_amplitude_preserved(self):
        x = signals.sine(NUM_SAMPLES, 1000.0, 44100, amplitude=0.9)
        y = resample(x, 44100, 48000, Quality.HIGH)
        assert metrics.amplitude(y) == pytest.approx(0.9, abs=0.01)


class TestStrictAntialias:
    """Beyond-reference mode: Config(strict_antialias=True) applies a
    delay-compensated 1:1 anti-alias prefilter before the default chain
    for non-integer downsampling (EnginePlan.aa_coeffs), closing the gap
    to real libsoxr (which rejects these aliases by 171+ dB where the Go
    reference leaves ~0-10 dB)."""

    @pytest.mark.parametrize("inr,outr,floor", [
        (48000, 32000, 172.0),       # libsoxr capture: 172.22
        (48000, 44100, 171.6),       # libsoxr capture: 171.59
        (48000, 11025, 145.0),       # multi-alias-fold chain
        (96000, 44100, 148.0),
    ])
    def test_attenuation(self, inr, outr, floor):
        from go_audio_resampler_tpu.engine import plan_engine as pe
        x = signals.alias_tones(NUM_SAMPLES, inr, outr)
        plan = pe(inr, outr, Quality.VERY_HIGH, True)
        y = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
        att = metrics.antialias_attenuation(x, y, inr, outr)
        assert att >= floor, f"strict alias attenuation {att:.1f} < {floor}"

    def test_vs_soxr_golden(self):
        # Beat the libsoxr captures on their own non-integer downsampling
        # alias measurements.
        from go_audio_resampler_tpu.engine import plan_engine as pe
        for inr, outr, key in [(48000, 32000, "48000_32000_alias_tones"),
                               (48000, 44100, "48000_44100_alias_tones")]:
            x = signals.alias_tones(NUM_SAMPLES, inr, outr)
            plan = pe(inr, outr, Quality.VERY_HIGH, True)
            y = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
            att = metrics.antialias_attenuation(x, y, inr, outr)
            assert att >= GOLDEN["antialiasing"][key] - 0.5, \
                f"{inr}->{outr}: {att:.1f} dB vs capture " \
                f"{GOLDEN['antialiasing'][key]}"

    @pytest.mark.parametrize("inr,outr", [(48000, 32000), (48000, 44100),
                                          (48000, 11025)])
    def test_no_passband_cost(self, inr, outr):
        # The v1 strict mode (polyphase cutoff moved to output Nyquist)
        # silently cost up to 39 dB of passband droop; v2 must keep the
        # default path's ripple and THD.
        from go_audio_resampler_tpu.engine import plan_engine as pe
        plan = pe(inr, outr, Quality.VERY_HIGH, True)
        x = signals.sine(NUM_SAMPLES, 1000.0, inr)
        y = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
        assert metrics.amplitude(y) == pytest.approx(0.9, abs=0.01)
        if outr > 4000:
            assert metrics.thd(y, outr, 1000.0, FFT_SIZE) <= -90.0
        xr, freqs = signals.passband_tones(NUM_SAMPLES, inr, outr)
        yr = np.asarray(oneshot(plan, xr[None], dtype=np.float64))[0]
        r = metrics.passband_ripple(yr, outr, freqs, FFT_SIZE)
        assert r.ripple_peak_peak <= 2.0, \
            f"strict ripple {r.ripple_peak_peak:.2f} dB"

    def test_streaming_matches_oneshot(self):
        from go_audio_resampler_tpu.engine import plan_engine as pe
        from go_audio_resampler_tpu.engine import EngineCore
        plan = pe(48000, 44100, Quality.HIGH, True)
        rng = np.random.default_rng(4)
        x = rng.standard_normal(3000)
        ref = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
        for blk in (512, 777):
            eng = EngineCore(plan, batch=1, block=blk, dtype=np.float64)
            got = np.concatenate([eng.process(x[:1000])[0],
                                  eng.process(x[1000:1003])[0],
                                  eng.process(x[1003:])[0],
                                  eng.flush()[0]])
            assert got.shape == ref.shape
            np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)

    def test_checkpoint_resume_strict(self, tmp_path):
        from go_audio_resampler_tpu.engine import (plan_engine as pe,
                                                   EngineCore,
                                                   save_stream_state,
                                                   load_stream_state)
        plan = pe(48000, 44100, Quality.HIGH, True)
        x = np.random.default_rng(5).standard_normal(4000)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        full = np.concatenate([eng.process(x)[0], eng.flush()[0]])
        eng_a = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        p1 = eng_a.process(x[:2100])[0]
        ck = tmp_path / "strict.npz"
        save_stream_state(eng_a, ck)
        eng_b = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        load_stream_state(eng_b, ck)
        resumed = np.concatenate([p1, eng_b.process(x[2100:])[0],
                                  eng_b.flush()[0]])
        np.testing.assert_array_equal(resumed, full)

    def test_public_api_flag(self):
        import go_audio_resampler_tpu as gar
        r = gar.new_resampler(gar.Config(48000, 32000,
                                         strict_antialias=True))
        x = signals.sine(8000, 1000.0, 48000)
        y = np.concatenate([r.process(x), r.flush()])
        assert np.all(np.isfinite(y))
