"""HQ inter-phase mode (beyond reference): corrected phase-bank boundary
wrap + 8x denser banks for non-exact-rational ratios.

The reference's getCoeff wraps phase modulo L without the tap shift
(/root/reference/internal/engine/polyphase_stage.go:105-117), so phases
{0, L-2, L-1} interpolate toward coefficients from the wrong kernel
position — a ~-88 dB THD floor on the general walk that this framework
reproduces bit-for-bit by default (parity).  ``hq_interp=True`` fixes the
wrap and densifies the banks (plan.HQ_PHASE_MULT), dropping the floor to
the filter's own response (measured -162 dB f64 on 44.1k->48,001 HIGH;
round-4 verdict item 3 target was -120).  Runtime device shapes are
unchanged — only bank bytes and host design time grow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from go_audio_resampler_tpu.engine import plan_engine
from go_audio_resampler_tpu.engine.plan import HQ_PHASE_MULT
from go_audio_resampler_tpu.engine.streaming import EngineCore
from go_audio_resampler_tpu.engine.oneshot import oneshot
from go_audio_resampler_tpu.filterdesign import Quality
from go_audio_resampler_tpu.filterdesign import params as fdp
from go_audio_resampler_tpu.utils import metrics

from independent import tone_fit

GENERAL = (44100.0, 48001.0, Quality.HIGH)   # no small exact rational form


def _stream(plan, x, block=2048):
    eng = EngineCore(plan, batch=1, block=block, dtype=jnp.float64)
    parts = [eng.process(x[None, :]), eng.flush()]
    return np.concatenate([p for p in parts if p.size], axis=1)[0]


def _sine(n, freq, rate, amp=0.5):
    return (amp * np.sin(2 * np.pi * freq * np.arange(n) / rate)
            ).astype(np.float64)


class TestBankConstruction:
    def test_corrected_wrap_fixes_boundary_phases(self):
        """Against a 8x-denser independently designed prototype, the
        default banks err up to ~-2 dB (rel peak) at the boundary phases
        while the corrected wrap stays at the interior level everywhere.
        """
        L = 203
        args = (L, 48001 / 88200, 44100 / 48001, True, Quality.HIGH)
        bank = fdp.design_polyphase_filter(*args)
        dense = fdp.design_polyphase_filter(*args, hq_phases=8 * L)
        T = bank.taps_per_phase
        flat8 = dense.coeffs
        scale = np.abs(bank.coeffs).max()

        def truth(j, k):
            m = 8 * j + k + 7   # center alignment of the 8x grid
            return flat8[m] if 0 <= m < flat8.size else 0.0

        def worst(correct_wrap, phases):
            A, B, C, D = fdp.cubic_phase_banks(bank, correct_wrap)
            w = 0.0
            for phase in phases:
                for k in range(8):
                    x = k / 8
                    interp = (A[phase] + x * (B[phase] + x * (
                        C[phase] + x * D[phase])))[::-1]
                    tr = np.array([truth(t * L + phase, k)
                                   for t in range(T)])
                    w = max(w, np.abs(interp - tr).max())
            return w / scale

        boundary = [0, L - 2, L - 1]
        interior = [1, 50, 100, 150, L - 3]
        assert worst(False, boundary) > 10 ** (-30 / 20)      # ref: ~-2 dB
        assert worst(True, boundary) < 10 ** (-95 / 20)
        # Default interior phases were always fine (and unchanged).
        assert worst(False, interior) < 10 ** (-95 / 20)

    def test_default_banks_identical_without_flag(self):
        """correct_wrap=False must reproduce the reference algorithm
        exactly: interior phases equal the corrected banks, boundary
        phases differ only in B/C/D (A = f0 is wrap-independent)."""
        L = 203
        bank = fdp.design_polyphase_filter(
            L, 48001 / 88200, 44100 / 48001, True, Quality.HIGH)
        A0, B0, C0, D0 = fdp.cubic_phase_banks(bank, correct_wrap=False)
        A1, B1, C1, D1 = fdp.cubic_phase_banks(bank, correct_wrap=True)
        np.testing.assert_array_equal(A0, A1)
        interior = slice(1, L - 2)
        np.testing.assert_array_equal(B0[interior], B1[interior])
        np.testing.assert_array_equal(C0[interior], C1[interior])
        np.testing.assert_array_equal(D0[interior], D1[interior])
        assert not np.array_equal(B0[L - 1], B1[L - 1])


class TestHQPlan:
    def test_plan_shape_invariants(self):
        inr, outr, q = GENERAL
        base = plan_engine(inr, outr, q)
        hq = plan_engine(inr, outr, q, False, True)
        assert hq.num_phases == base.num_phases * HQ_PHASE_MULT
        # Same per-output runtime cost: taps-per-phase unchanged.
        assert hq.poly_taps == base.poly_taps
        assert hq.factor == base.factor and hq.pre_taps == base.pre_taps
        # The walk step scales with L (same realized ratio).
        assert abs(hq.step / hq.num_phases
                   - base.step / base.num_phases) < 1.0
        assert hq.fingerprint != base.fingerprint

    def test_exact_rational_is_noop(self):
        base = plan_engine(44100.0, 48000.0, Quality.HIGH)
        hq = plan_engine(44100.0, 48000.0, Quality.HIGH, False, True)
        assert hq.num_phases == base.num_phases
        assert hq.is_rational_exact
        np.testing.assert_array_equal(hq.bank_a, base.bank_a)

    def test_cubic_and_decimate_unaffected(self):
        assert plan_engine(44100.0, 48001.0, Quality.QUICK, False,
                           True).kind == 'cubic'
        p = plan_engine(96000.0, 48000.0, Quality.HIGH, False, True)
        assert p.kind == 'decimate'


class TestHQQuality:
    def test_general_thd_beats_target(self):
        """Round-4 verdict item 3: <= -120 dB THD on the 44.1k->48,001
        HIGH stream (default mode: ~-88).  Measured -162 f64; floor set
        at -140 (beats the reference's published VHQ one-shot number on
        a path where the reference's own scheme floors at -88)."""
        inr, outr, q = GENERAL
        x = _sine(44100, 1000.0, inr)
        y = _stream(plan_engine(inr, outr, q, False, True), x)
        thd = metrics.thd(y[2000:-2000], outr, 1000.0)
        assert thd <= -140.0, f"hq THD {thd:.2f} dB"

    def test_default_path_unchanged_reference_floor(self):
        """The default general path keeps the reference's boundary-wrap
        behavior (parity): THD sits in the documented -84..-95 band."""
        inr, outr, q = GENERAL
        x = _sine(44100, 1000.0, inr)
        y = _stream(plan_engine(inr, outr, q), x)
        thd = metrics.thd(y[2000:-2000], outr, 1000.0)
        assert -95.0 <= thd <= -84.0, f"default THD {thd:.2f} dB"

    def test_tone_fit_independent_teeth(self):
        """Independent ground truth (no reference implementation): the
        LS-fit residual (= THD+N, incl. broadband noise that the
        harmonic-bin THD metric does not see) of a resampled tone.

        The fit runs at the walk's REALIZED output rate
        (inr * F * L * 2^16 / step): the step's ~1e-9 relative rounding
        is a constant frequency scale whose phase drift over the 1 s fit
        window would otherwise dominate the hq residual (-113 dB at the
        nominal rate vs -138 realized).

        Default parity path: the boundary-wrap glitches are broadband,
        so THD+N sits at ~-51 dB even though THD reads -88 — pinned here
        so a silent change of the parity behavior is caught too."""
        inr, outr, q = GENERAL
        x = _sine(44100, 997.0, inr, amp=1.0)

        def fit(plan):
            outr_real = (inr * plan.factor * plan.num_phases * 65536.0
                         / plan.step)
            return tone_fit(_stream(plan, x), outr_real, 997.0)

        amp_hq, resid_hq = fit(plan_engine(inr, outr, q, False, True))
        assert abs(amp_hq - 1.0) <= 1e-4
        assert resid_hq <= -130.0, f"hq residual {resid_hq:.2f} dB"
        amp_d, resid_d = fit(plan_engine(inr, outr, q))
        assert abs(amp_d - 1.0) <= 1e-3
        assert -62.0 <= resid_d <= -42.0, f"default {resid_d:.2f} dB"

    def test_oneshot_matches_stream(self):
        """Chunking invariance holds for hq plans (same walk semantics)."""
        inr, outr, q = GENERAL
        plan = plan_engine(inr, outr, q, False, True)
        x = _sine(12000, 1000.0, inr)
        y1 = np.asarray(oneshot(plan, jnp.asarray(x[None, :]),
                                dtype=jnp.float64))[0]
        y2 = _stream(plan, x, block=640)
        k = min(len(y1), len(y2))
        np.testing.assert_allclose(y1[:k], y2[:k], atol=1e-12)


class TestHQAPISurface:
    def test_config_and_convenience(self):
        import go_audio_resampler_tpu as gar

        r = gar.new_resampler(gar.Config(
            44100, 48001, channels=1, dtype=np.float64, hq_interp=True,
            quality=gar.get_preset_spec(gar.QualityPreset.HIGH)))
        x = _sine(9000, 997.0, 44100.0)
        y = np.concatenate([r.process(x), r.flush()])
        assert y.size > 9000
        eng = gar.new_engine(44100, 48001, gar.QualityPreset.HIGH,
                             hq_interp=True)
        assert eng.plan.num_phases == 203 * HQ_PHASE_MULT

    def test_functional_hq(self):
        from go_audio_resampler_tpu import functional as F

        x = _sine(6000, 997.0, 44100.0)
        y_hq = np.asarray(F.resample(x, 44100.0, 48001.0, hq_interp=True,
                                     dtype=jnp.float64))
        assert y_hq.shape[-1] == F.output_length(6000, 44100.0, 48001.0,
                                                 hq_interp=True)
        amp, resid = tone_fit(y_hq, 48001.0, 997.0)
        assert abs(amp - 0.5) <= 1e-4 * 0.5 + 1e-5
        # functional lowers through the same walk; hq floor holds.
        assert resid <= -120.0
