"""Per-preset designed-bank envelope pins (design-regression tier).

The reference pins tap counts, phase counts and filter-length ranges per
quality preset so accidental filter-design drift is caught at the
parameter level (quality_presets_test.go:86-326, soxr_filter_test.go:21-486).
These pins were captured from the verified round-3 design path; any change
to filterdesign/ that moves them is a deliberate design change and must
update this table consciously ("only made stricter, never relaxed").
"""

import numpy as np
import pytest

from go_audio_resampler_tpu.engine.plan import plan_engine
from go_audio_resampler_tpu.filterdesign import Quality as Q

# (in_rate, out_rate, quality) -> (kind, factor, pre_taps, decim_taps,
#                                  num_phases, poly_taps, step)
ENVELOPES = {
    (44100, 48000, Q.LOW): ('two_stage', 2, 132, 0, 80, 32, 9633792),
    (44100, 48000, Q.MEDIUM): ('two_stage', 2, 132, 0, 80, 32, 9633792),
    (44100, 48000, Q.HIGH): ('two_stage', 2, 166, 0, 80, 64, 9633792),
    (44100, 48000, Q.BITS_24): ('two_stage', 2, 200, 0, 80, 100, 9633792),
    (44100, 48000, Q.VERY_HIGH): ('two_stage', 2, 233, 0, 80, 102, 9633792),
    (44100, 48000, Q.BITS_32): ('two_stage', 2, 267, 0, 80, 102, 9633792),
    (48000, 44100, Q.HIGH): ('two_stage', 2, 166, 0, 147, 55, 20971520),
    (48000, 44100, Q.VERY_HIGH): ('two_stage', 2, 233, 0, 147, 55, 20971520),
    (48000, 32000, Q.HIGH): ('two_stage', 2, 166, 0, 80, 64, 15728640),
    (48000, 32000, Q.VERY_HIGH): ('two_stage', 2, 233, 0, 80, 102, 15728640),
    (96000, 48000, Q.LOW): ('decimate', 2, 0, 163, 0, 0, 0),
    (96000, 48000, Q.MEDIUM): ('decimate', 2, 0, 585, 0, 0, 0),
    (96000, 48000, Q.HIGH): ('decimate', 2, 0, 901, 0, 0, 0),
    (96000, 48000, Q.BITS_24): ('decimate', 2, 0, 913, 0, 0, 0),
    (96000, 48000, Q.VERY_HIGH): ('decimate', 2, 0, 1069, 0, 0, 0),
    (96000, 48000, Q.BITS_32): ('decimate', 2, 0, 1223, 0, 0, 0),
    (48000, 96000, Q.HIGH): ('dft_up', 2, 166, 0, 0, 0, 0),
    (48000, 96000, Q.VERY_HIGH): ('dft_up', 2, 233, 0, 0, 0, 0),
    (44100, 96000, Q.HIGH): ('two_stage', 2, 166, 0, 160, 51, 9633792),
    (44100, 96000, Q.VERY_HIGH): ('two_stage', 2, 233, 0, 160, 51, 9633792),
}


class TestPresetEnvelopes:
    @pytest.mark.parametrize("key", sorted(ENVELOPES, key=str))
    def test_designed_bank_pinned(self, key):
        inr, outr, q = key
        kind, factor, pre, decim, phases, taps, step = ENVELOPES[key]
        p = plan_engine(float(inr), float(outr), q)
        got = (p.kind, p.factor, p.pre_taps, p.decim_taps, p.num_phases,
               p.poly_taps, p.step)
        assert got == (kind, factor, pre, decim, phases, taps, step), (
            f"designed bank drifted for {inr}->{outr} {q.name}: {got}")

    def test_reference_structural_invariants(self):
        # quality_presets_test.go:86-326 analogs that must hold for every
        # config: taps/phase caps 32/64/100(+interp slack) by quality,
        # phases from findRationalApprox in [64, 256], odd decim taps.
        for (inr, outr, q), (kind, *_rest) in ENVELOPES.items():
            p = plan_engine(float(inr), float(outr), q)
            if p.kind == 'two_stage':
                assert 64 <= p.num_phases <= 256
                cap = {Q.LOW: 32, Q.MEDIUM: 32, Q.HIGH: 64,
                       Q.BITS_24: 100}.get(q, 102)
                assert 4 <= p.poly_taps <= cap + 2
            if p.kind == 'decimate':
                assert p.decim_taps % 2 == 1
                assert p.decim_taps <= 8191
            if p.pre_taps:
                assert 3 <= p.pre_taps <= 8191

    def test_preset_monotonicity(self):
        # Higher quality never designs a shorter total filter (the
        # reference's preset ordering invariant).
        for inr, outr in ((44100, 48000), (96000, 48000)):
            lengths = []
            for q in (Q.LOW, Q.MEDIUM, Q.HIGH, Q.VERY_HIGH):
                p = plan_engine(float(inr), float(outr), q)
                lengths.append(p.filter_length())
            assert lengths == sorted(lengths), (inr, outr, lengths)

    def test_designed_prototype_dc_gain(self):
        # designPolyphaseFilter normalizes the prototype DC gain to the
        # phase count (filter_params.go:229-286): each phase row sums
        # to ~1 so DC passes at unit gain.
        for q in (Q.HIGH, Q.VERY_HIGH):
            p = plan_engine(44100.0, 48000.0, q)
            row_sums = p.bank_a.sum(axis=1)
            np.testing.assert_allclose(row_sums, 1.0, atol=5e-3)
            np.testing.assert_allclose(p.pre_coeffs.sum(axis=1), 1.0,
                                       atol=5e-3)
