"""Filter-design unit tests.

Mirrors the reference's design-time test tiers (SURVEY.md section 4.1):
Bessel known values, Kaiser beta vs soxr-derived expectations
(internal/mathutil/soxr_reference_test.go:19-56), window symmetry and DC
gain (internal/filter/kaiser_test.go), Fn normalization cases
(internal/engine/critical_functions_test.go:183-290), and per-preset
tap-count structure.
"""

import math

import numpy as np
import pytest

from go_audio_resampler_tpu import filterdesign as fd
from go_audio_resampler_tpu.filterdesign import Quality


class TestBessel:
    def test_i0_known_values(self):
        # I0(0)=1, I0(1)=1.2660658..., I0(2)=2.2795853..., I0(5)=27.239871...
        assert fd.bessel_i0(0.0) == pytest.approx(1.0, abs=1e-12)
        assert fd.bessel_i0(1.0) == pytest.approx(1.2660658777520082, rel=1e-7)
        assert fd.bessel_i0(2.0) == pytest.approx(2.2795853023360673, rel=1e-7)
        assert fd.bessel_i0(5.0) == pytest.approx(27.239871823604442, rel=1e-6)
        assert fd.bessel_i0(10.0) == pytest.approx(2815.716628466254, rel=1e-6)

    def test_i0_symmetry(self):
        for x in (0.5, 1.7, 3.0, 7.5):
            assert fd.bessel_i0(x) == pytest.approx(fd.bessel_i0(-x), rel=1e-12)

    def test_i1_known_values(self):
        # I1(1)=0.5651591..., I1(2)=1.5906368...
        assert fd.bessel_i1(1.0) == pytest.approx(0.565159103992485, rel=1e-6)
        assert fd.bessel_i1(2.0) == pytest.approx(1.5906368546373291, rel=1e-6)
        assert fd.bessel_i1(-2.0) == pytest.approx(-1.5906368546373291, rel=1e-6)

    def test_i0_ratio_limits(self):
        assert fd.bessel_i0_ratio(1e-12) == pytest.approx(5e-13, abs=1e-13)
        # Large-x asymptote: 1 - 1/(2x)
        assert fd.bessel_i0_ratio(100.0) == pytest.approx(1 - 1 / 200.0, rel=1e-6)


class TestKaiserBeta:
    # soxr-derived expected values (mathutil/soxr_reference_test.go:19-56)
    CASES = [
        (20, 0.1, 0.0, False),
        (15, 0.1, 0.0, False),
        (30, 0.1, 2.12, False),
        (40, 0.1, 3.40, False),
        (50, 0.1, 4.53, False),
        (55, 0.1, 5.103, False),
        (60, 0.02, 5.653, True),
        (80, 0.02, 7.857, True),
        (100, 0.02, 10.056, True),
        (120, 0.02, 12.247, True),
        (140, 0.02, 14.427, True),
        (160, 0.02, 16.594, True),
        (174.58, 0.02175, 18.4, True),
    ]

    @pytest.mark.parametrize("att,trbw,expected,use_trbw", CASES)
    def test_soxr_reference(self, att, trbw, expected, use_trbw):
        got = (fd.kaiser_beta_with_tr_bw(att, trbw) if use_trbw
               else fd.kaiser_beta(att))
        tol = max(abs(expected * 0.05), 0.1)
        assert got == pytest.approx(expected, abs=tol)

    def test_monotonic(self):
        betas = [fd.kaiser_beta(a) for a in range(21, 200, 5)]
        assert all(b2 >= b1 for b1, b2 in zip(betas, betas[1:]))

    def test_attenuation_inverse(self):
        for att in (60.0, 100.0, 150.0):
            beta = fd.kaiser_beta(att)
            assert fd.kaiser_attenuation(beta) == pytest.approx(att, rel=0.01)


class TestFilterLength:
    def test_kaiser_formula(self):
        # N ~ (att-8)/(2.285*2*pi*trBw), odd
        n = fd.estimate_filter_length(100.0, 0.05)
        expected = (100 - 8) / (2.285 * 2 * math.pi * 0.05)
        assert abs(n - expected) <= 2
        assert n % 2 == 1

    def test_bounds(self):
        assert fd.estimate_filter_length(10.0, 0.4) == fd.MIN_FILTER_LENGTH
        assert fd.estimate_filter_length(500.0, 1e-6) == fd.MAX_FILTER_LENGTH

    def test_zero_trbw_guard(self):
        assert fd.estimate_filter_length(100.0, 0.0) > 0


class TestKaiserWindow:
    def test_symmetry(self):
        for length in (15, 64, 101):
            w = fd.kaiser_window(length, 8.0)
            np.testing.assert_allclose(w, w[::-1], rtol=1e-12)

    def test_center_is_one(self):
        w = fd.kaiser_window(101, 10.0)
        assert w[50] == pytest.approx(1.0, abs=1e-12)

    def test_edges_small(self):
        w = fd.kaiser_window(101, 10.0)
        assert w[0] == pytest.approx(1.0 / fd.bessel_i0(10.0), rel=1e-9)

    def test_negative_beta_equivalent(self):
        np.testing.assert_allclose(fd.kaiser_window(33, -5.0),
                                   fd.kaiser_window(33, 5.0))

    def test_extreme_beta_no_nan(self):
        w = fd.kaiser_window(65, 800.0)
        assert np.all(np.isfinite(w))
        assert w[32] == pytest.approx(1.0, abs=1e-9)

    def test_degenerate_lengths(self):
        assert len(fd.kaiser_window(0, 5.0)) == 0
        assert fd.kaiser_window(1, 5.0)[0] == 1.0


class TestLowpassDesign:
    def test_dc_gain(self):
        h = fd.design_lowpass(fd.FilterParams(101, 0.25, 100.0, 1.0))
        assert float(h.sum()) == pytest.approx(1.0, abs=1e-12)

    def test_symmetric_linear_phase(self):
        h = fd.design_lowpass(fd.FilterParams(101, 0.2, 90.0, 1.0))
        np.testing.assert_allclose(h, h[::-1], atol=1e-15)

    def test_stopband_attenuation(self):
        h = fd.design_lowpass_auto(0.2, 0.05, 80.0, 1.0)
        resp = fd.frequency_response(h, 2048)
        stop = resp.frequencies >= 0.2 + 0.05
        stop_db = 20 * np.log10(np.maximum(resp.magnitude[stop], 1e-12))
        assert stop_db.max() < -78.0

    def test_passband_flat(self):
        h = fd.design_lowpass_auto(0.2, 0.05, 80.0, 1.0)
        resp = fd.frequency_response(h, 2048)
        pb = resp.frequencies <= 0.15
        pb_db = 20 * np.log10(np.maximum(resp.magnitude[pb], 1e-12))
        assert np.abs(pb_db).max() < 0.1

    def test_validation_errors(self):
        with pytest.raises(fd.FilterDesignError):
            fd.design_lowpass(fd.FilterParams(1, 0.2, 80.0, 1.0))
        with pytest.raises(fd.FilterDesignError):
            fd.design_lowpass(fd.FilterParams(10001, 0.2, 80.0, 1.0))
        with pytest.raises(fd.FilterDesignError):
            fd.design_lowpass(fd.FilterParams(101, 0.6, 80.0, 1.0))
        with pytest.raises(fd.FilterDesignError):
            fd.design_lowpass(fd.FilterParams(101, 0.2, -1.0, 1.0))
        with pytest.raises(fd.FilterDesignError):
            fd.design_lowpass(fd.FilterParams(101, 0.2, 600.0, 1.0))
        with pytest.raises(fd.FilterDesignError):
            fd.design_lowpass(fd.FilterParams(101, 0.2, 80.0, 0.0))


class TestQualityModel:
    def test_attenuations(self):
        # (bits+1)*6.0206 (filter_params.go:63-68)
        assert fd.quality_to_attenuation(Quality.QUICK) == pytest.approx(9 * 6.0206)
        assert fd.quality_to_attenuation(Quality.LOW) == pytest.approx(17 * 6.0206)
        assert fd.quality_to_attenuation(Quality.MEDIUM) == pytest.approx(17 * 6.0206)
        assert fd.quality_to_attenuation(Quality.HIGH) == pytest.approx(21 * 6.0206)
        assert fd.quality_to_attenuation(Quality.VERY_HIGH) == pytest.approx(29 * 6.0206)
        assert fd.quality_to_attenuation(Quality.BITS_32) == pytest.approx(33 * 6.0206)

    def test_passbands(self):
        assert fd.quality_to_passband_end(Quality.LOW) == 0.67625
        assert fd.quality_to_passband_end(Quality.MEDIUM) == 0.91
        assert fd.quality_to_passband_end(Quality.HIGH) == 0.912
        assert fd.quality_to_passband_end(Quality.VERY_HIGH) == 0.913


class TestLsxInvFResp:
    def test_range(self):
        v = fd.lsx_inv_f_resp(-0.01, 126.0)
        assert 0.0 < v < 1.0

    def test_guards_no_nan(self):
        for att in (0.1, 1.0, 300.0, 500.0):
            for drop in (-0.01, -3.0, -0.5):
                assert math.isfinite(fd.lsx_inv_f_resp(drop, att))

    def test_monotone_in_drop(self):
        # A deeper drop is reached further along the transition band.
        v1 = fd.lsx_inv_f_resp(-0.01, 126.0)
        v2 = fd.lsx_inv_f_resp(-3.0, 126.0)
        assert v2 > v1


class TestComputePolyphaseFilterParams:
    """Fn normalization cases from critical_functions_test.go:183-290."""

    ATT = 126.0
    PASSBAND = 0.912

    @pytest.mark.parametrize(
        "num_phases,ratio,total_io,has_pre,expect_fn,is_up",
        [
            (147, 48000 / 44100, 44100 / 48000, True, 1.0, True),
            (147, 96000 / 44100, 44100 / 96000, True, 1.0, True),
            (160, 44100 / 48000, 48000 / 44100, False, 1.0, False),
            (1, 48000 / 96000, 96000 / 48000, False, 1.0, False),
            (2, 32000 / 48000, 48000 / 32000, False, 1.0, False),
            (160, 44100 / 48000, 48000 / 44100, True, 2.0 * (48000 / 44100), False),
            (1, 48000 / 96000, 96000 / 48000, True, 4.0, False),
        ])
    def test_fn_normalization(self, num_phases, ratio, total_io, has_pre,
                              expect_fn, is_up):
        p = fd.compute_polyphase_filter_params(
            num_phases, ratio, total_io, has_pre, self.ATT, self.PASSBAND)
        assert p.is_upsampling == is_up
        assert p.has_pre_stage == has_pre
        assert p.fn == pytest.approx(expect_fn, rel=0.01)
        if not is_up and has_pre:
            assert p.fs_raw == pytest.approx(3.0 + abs(ratio - 1.0), abs=0.01)
        assert p.fp == pytest.approx(p.fp_raw / p.fn, abs=1e-4)
        assert p.fs == pytest.approx(p.fs_raw / p.fn, abs=1e-4)

    def test_fp1_downsampling_trace(self):
        # 48->44.1 with 2x pre-stage (96 kHz intermediate): soxr trace values
        # Fp1 = 0.913*0.459375 = 0.4197, Fs1 = 0.459375 (filter_params.go:468-485)
        p = fd.compute_polyphase_filter_params(
            80, 44100.0 / 96000.0, 48000.0 / 44100.0, False,
            fd.quality_to_attenuation(Quality.VERY_HIGH), 0.913)
        assert p.fp1 == pytest.approx(0.913 * 0.459375, abs=1e-4)
        assert p.fs1 == pytest.approx(0.459375, abs=1e-6)

    def test_taps_caps_per_quality(self):
        # Quality caps: 32 / 64 / 100 taps per phase (filter_params.go:586-599)
        low = fd.compute_polyphase_filter_params(
            80, 48000 / 88200, 44100 / 48000, True,
            fd.quality_to_attenuation(Quality.LOW), 0.67625)
        high = fd.compute_polyphase_filter_params(
            80, 48000 / 88200, 44100 / 48000, True,
            fd.quality_to_attenuation(Quality.HIGH), 0.912)
        vhq = fd.compute_polyphase_filter_params(
            80, 48000 / 88200, 44100 / 48000, True,
            fd.quality_to_attenuation(Quality.VERY_HIGH), 0.913)
        assert low.taps_per_phase <= 32
        assert high.taps_per_phase <= 64
        # CD->DAT High hits the cap: 64x80 (README.md:470, BASELINE.md)
        assert high.taps_per_phase == 64
        # VHQ att (174.6 dB) >= 160 takes the library-limit branch:
        # (8191) // 80 = 102 taps/phase (filter_params.go:600-604)
        assert vhq.taps_per_phase == 102

    def test_hard_tap_limit(self):
        p = fd.compute_polyphase_filter_params(
            256, 0.999, 1.001, False, 200.0, 0.913)
        assert p.total_taps <= 8190


class TestRationalApprox:
    def test_cd_dat_uses_80_phases(self):
        # 88.2k -> 48k polyphase stage ratio; soxr picks 80 phases for CD->DAT
        l, step = fd.find_rational_approx(48000.0 / 88200.0)
        assert l == 80
        assert step == 147

    def test_exact_match(self):
        l, step = fd.find_rational_approx(0.5)
        assert step / l == pytest.approx(2.0)

    def test_step_full_precision(self):
        ratio = 48000.0 / 88200.0
        l, _ = fd.find_rational_approx(ratio)
        step = fd.polyphase_step(ratio, l)
        assert step == 147 * 65536  # exact for CD->DAT


class TestPolyphaseDesign:
    def test_phase_dc_gains_near_unity(self):
        bank = fd.design_polyphase_filter(
            80, 48000.0 / 88200.0, 44100.0 / 48000.0, True, Quality.HIGH)
        L, T = bank.num_phases, bank.taps_per_phase
        flat = bank.coeffs
        gains = [sum(flat[t * L + p] for t in range(T)) for p in range(L)]
        assert np.mean(gains) == pytest.approx(1.0, abs=0.01)
        assert max(abs(g - 1.0) for g in gains) < 0.05

    def test_cubic_banks_interpolate_endpoints(self):
        bank = fd.design_polyphase_filter(
            80, 48000.0 / 88200.0, 44100.0 / 48000.0, True, Quality.HIGH)
        A, B, C, D = fd.cubic_phase_banks(bank)
        L, T = A.shape
        # coef(0) = a = coeff of this phase; coef(1) = a+b+c+d = next phase
        for phase in (0, 5, 40, L - 1):
            nxt = (phase + 1) % L
            np.testing.assert_allclose(A[phase] + B[phase] + C[phase] + D[phase],
                                       A[nxt], atol=1e-12)

    def test_bank_shapes(self):
        bank = fd.design_polyphase_filter(
            80, 48000.0 / 88200.0, 44100.0 / 48000.0, True, Quality.HIGH)
        A, B, C, D = fd.cubic_phase_banks(bank)
        assert A.shape == B.shape == C.shape == D.shape == (80, 64)


class TestDFTStageDesign:
    def test_upsample_2x_high(self):
        f = fd.design_dft_upsample(2, Quality.HIGH)
        assert f.factor == 2
        # "166 taps x2" for High (README.md:464-471): 331-tap prototype
        # decomposed into 2 phases of 166 taps each
        assert f.taps_per_phase == 166
        assert f.phase_coeffs.shape == (2, 166)

    def test_upsample_dc_gain(self):
        # Each phase should have DC gain ~1 (prototype gain 1 scaled by L)
        f = fd.design_dft_upsample(2, Quality.HIGH)
        for phase in range(2):
            assert float(f.phase_coeffs[phase].sum()) == pytest.approx(1.0, abs=0.01)

    def test_upsample_factor_1_passthrough(self):
        f = fd.design_dft_upsample(1, Quality.HIGH)
        assert f.factor == 1 and f.taps_per_phase == 0

    def test_decimation_2x(self):
        f = fd.design_decimation(2, Quality.HIGH)
        assert f.factor == 2
        assert f.num_taps > 100
        assert float(f.coeffs.sum()) == pytest.approx(1.0, abs=0.01)

    def test_decimation_stopband(self):
        f = fd.design_decimation(2, Quality.HIGH)
        resp = fd.frequency_response(f.coeffs[::-1], 4096)
        # Stopband above input-rate 0.25 (= output Nyquist): deep attenuation
        stop = resp.frequencies >= 0.26
        stop_db = 20 * np.log10(np.maximum(resp.magnitude[stop], 1e-12))
        assert stop_db.max() < -120.0


class TestStandalonePolyphaseBank:
    def test_structure(self):
        bank = fd.design_polyphase_bank(32, 16, 0.45, 100.0,
                                        fd.InterpolationOrder.CUBIC)
        assert bank.num_phases == 32
        assert bank.taps_per_phase == 16
        assert bank.coeffs.shape == (512, 4)

    def test_min_taps_enforced(self):
        bank = fd.design_polyphase_bank(8, 2, 0.45, 80.0)
        assert bank.taps_per_phase == 16

    def test_phase_dc_gain(self):
        bank = fd.design_polyphase_bank(32, 32, 0.45, 100.0)
        gains = [bank.phase_dc_gain(p) for p in range(32)]
        assert np.mean(gains) == pytest.approx(1.0, abs=0.02)

    def test_interpolation_orders(self):
        for order in fd.InterpolationOrder:
            bank = fd.design_polyphase_bank(16, 16, 0.45, 90.0, order)
            assert bank.coeffs.shape[1] == int(order) + 1

    def test_get_coefficient_endpoints(self):
        bank = fd.design_polyphase_bank(16, 16, 0.45, 90.0,
                                        fd.InterpolationOrder.CUBIC)
        # frac=0 -> base coefficient; frac=1 -> next phase's base coefficient
        for tap in (0, 7):
            for phase in (0, 5, 15):
                base = bank.coeffs[tap * 16 + phase, 0]
                nxt = bank.coeffs[tap * 16 + (phase + 1) % 16, 0]
                assert bank.get_coefficient(tap, phase, 0.0) == pytest.approx(base)
                assert bank.get_coefficient(tap, phase, 1.0) == pytest.approx(
                    nxt, abs=1e-10)
