"""Fused pipeline correctness: the composite banded operator vs the chain.

The fused path (pipeline/fused.py) collapses the planned stage chain into
one periodic banded matrix; its emitted stream must equal the per-stage
chain's (the exact semantic reference, itself oracle-verified) for every
topology, length, chunking and channel count.  Mirrors the reference's
pipeline-path behavioral contracts (constant.go:255-293, 349-389).
"""

import numpy as np
import pytest

import go_audio_resampler_tpu as gar
from go_audio_resampler_tpu.engine import plan_engine, oneshot
from go_audio_resampler_tpu.filterdesign import Quality
from go_audio_resampler_tpu.pipeline.fused import (
    BandedOp, banded_from_plan, compose, fuse_chain)
from go_audio_resampler_tpu.utils import signals

RNG = np.random.default_rng(7)


def make(inr, outr, q=gar.QualityPreset.HIGH, ch=1, fused=True,
         monkeypatch=None):
    cfg = gar.Config(inr, outr, channels=ch,
                     quality=gar.QualitySpec(preset=q))
    if not fused:
        assert monkeypatch is not None
        monkeypatch.setenv("GAR_TPU_FUSE_PIPELINE", "0")
        r = gar.new_resampler(cfg)
        monkeypatch.delenv("GAR_TPU_FUSE_PIPELINE")
        assert r._fused is None
        return r
    r = gar.new_resampler(cfg)
    return r


class TestBandedFromPlan:
    """Each plan kind's BandedOp reproduces the engine one-shot exactly."""

    @pytest.mark.parametrize("inr,outr,q", [
        (48000, 96000, Quality.HIGH),      # dft_up factor 2
        (48000, 144000, Quality.LOW),      # dft_up factor 3
        (48000, 24000, Quality.HIGH),      # decimate factor 2
        (48000, 12000, Quality.VERY_HIGH),  # decimate factor 4
        (48000, 32000, Quality.HIGH),      # two_stage rational 2/3
        (44100, 48000, Quality.VERY_HIGH),  # two_stage rational CD->DAT
    ])
    def test_matches_oneshot(self, inr, outr, q):
        plan = plan_engine(float(inr), float(outr), q)
        op = banded_from_plan(plan)
        assert op is not None
        for n in (257, 1000, 2048):
            x = RNG.standard_normal((2, n))
            want = np.asarray(oneshot(plan, x, dtype=np.float64))
            got = op.apply(x)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)

    def test_strict_antialias_composes_in(self):
        plan = plan_engine(48000.0, 32000.0, Quality.VERY_HIGH,
                           strict_antialias=True)
        assert plan.aa_taps > 0
        op = banded_from_plan(plan)
        assert op is not None and op.lam >= 0
        x = RNG.standard_normal((1, 1500))
        want = np.asarray(oneshot(plan, x, dtype=np.float64))
        got = op.apply(x)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-13)

    def test_non_periodic_plans_return_none(self):
        assert banded_from_plan(
            plan_engine(44100.0, 48001.0, Quality.HIGH)) is None  # non-exact
        assert banded_from_plan(
            plan_engine(44100.0, 48000.0, Quality.QUICK)) is None  # cubic


class TestCompose:
    """compose(A, B) == apply B after A, counts folded."""

    @pytest.mark.parametrize("chain", [
        [(48000, 24000, Quality.HIGH), (24000, 12000, Quality.HIGH)],
        [(48000, 24000, Quality.HIGH), (24000, 16000, Quality.HIGH)],
        [(48000, 96000, Quality.LOW), (96000, 64000, Quality.LOW)],
        [(48000, 24000, Quality.VERY_HIGH), (24000, 12000, Quality.VERY_HIGH),
         (12000, 8000, Quality.VERY_HIGH)],
    ])
    def test_matches_sequential(self, chain):
        plans = [plan_engine(float(a), float(b), q) for a, b, q in chain]
        ops = [banded_from_plan(p) for p in plans]
        comp = ops[0]
        for op in ops[1:]:
            comp = compose(comp, op)
        for n in (400, 1111, 4096):
            x = RNG.standard_normal((1, n))
            seq = x
            for p in plans:
                seq = np.asarray(oneshot(p, seq, dtype=np.float64))
            got = comp.apply(x)
            assert got.shape == seq.shape, (got.shape, seq.shape)
            np.testing.assert_allclose(got, seq, rtol=1e-11, atol=1e-13)

    @pytest.mark.parametrize("chain", [
        # Downstream strict-antialias stage: B.lam > 0 produces an
        # aperiodic head whose reach must be CEILED to whole B-periods
        # (a floored reach leaves the last partial period on the
        # periodic rows, which read real samples where the truncated
        # upstream stream is zero).
        [(48000, 24000, Quality.HIGH, False),
         (24000, 22050, Quality.HIGH, True)],
        # Upstream P > 1 (DFT upsample) into B.lam > 0: the left-context
        # taps hit j < 0 with A.P > 1, where FLOORED division is load-
        # bearing (truncated division misplaces the odd negative taps by
        # A.I and corrupts every later frame, not just the head).
        [(24000, 48000, Quality.HIGH, False),
         (48000, 44100, Quality.HIGH, True)],
        # Head-on-head: a composite that already has head rows feeding
        # another lam > 0 stage (exercises the A.head branch of the
        # head assembly).
        [(48000, 24000, Quality.HIGH, False),
         (24000, 22050, Quality.HIGH, True),
         (22050, 16000, Quality.HIGH, True)],
        # MEDIUM's shorter filters land B.lam < B.I, so a FLOORED head
        # reach computes zero head periods and drops the head entirely;
        # and MEDIUM's fatter filter tails make the boundary deviation
        # coefficient-level (~1e-3 here) instead of tail-x-tail noise —
        # this chain is what pins the ceil in compose()'s n_head.
        [(48000, 24000, Quality.MEDIUM, False),
         (24000, 22050, Quality.MEDIUM, True)],
    ])
    def test_matches_sequential_with_head(self, chain):
        plans = [plan_engine(float(a), float(b), q, aa)
                 for a, b, q, aa in chain]
        ops = [banded_from_plan(p) for p in plans]
        comp = ops[0]
        for op in ops[1:]:
            comp = compose(comp, op)
        assert comp.n_head > 0, "chain must produce an aperiodic head"
        for n in (64, 400, 1111, 4096):
            x = RNG.standard_normal((1, n))
            seq = x
            for p in plans:
                seq = np.asarray(oneshot(p, seq, dtype=np.float64))
            got = comp.apply(x)
            assert got.shape == seq.shape, (got.shape, seq.shape)
            # atol 1e-9, not 1e-13: short inputs leave the head outputs
            # deep in the filters' pre-ring (values ~1e-12 by coefficient
            # cancellation), where different summation orders legitimately
            # differ at absolute float64-noise level.  A geometry bug is
            # a coefficient-level (~1) error — 9 orders above this.
            np.testing.assert_allclose(got, seq, rtol=1e-9, atol=1e-9)

    def test_count_folding(self):
        plans = [plan_engine(48000.0, 24000.0, Quality.HIGH),
                 plan_engine(24000.0, 16000.0, Quality.HIGH)]
        comp = fuse_chain(plans)
        for n in (100, 999, 5000):
            want = plans[1].lengths.canonical(plans[0].lengths.canonical(n))
            assert comp.count(n) == want


class TestFusedResampler:
    """The public pipeline path with fusion equals the per-stage chain."""

    CASES = [
        (48000, 8000, gar.QualityPreset.HIGH),     # 2 half-bands + 2/3
        (8000, 48000, gar.QualityPreset.HIGH),     # up chain
        (44100, 11025, gar.QualityPreset.MEDIUM),  # exactly 2 half-bands
        (192000, 8000, gar.QualityPreset.HIGH),    # deep chain (1/24)
        (48000, 8000, gar.QualityPreset.VERY_HIGH),
    ]

    @pytest.mark.parametrize("inr,outr,q", CASES)
    def test_fused_equals_chain(self, inr, outr, q, monkeypatch):
        rf = make(inr, outr, q)
        if rf._fused is None:
            pytest.skip("chain not banded-fusable for this config")
        rc = make(inr, outr, q, fused=False, monkeypatch=monkeypatch)
        x = signals.sine(9000, 440.0, inr)
        a = np.concatenate([rf.process(x), rf.flush()])
        b = np.concatenate([rc.process(x), rc.flush()])
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11)

    @pytest.mark.parametrize("chunk", [256, 700, 4096])
    def test_chunking_invariance(self, chunk):
        r1 = make(48000, 8000)
        r2 = make(48000, 8000)
        x = signals.sine(9000, 800.0, 48000)
        a = np.concatenate([r1.process(x), r1.flush()])
        outs = [r2.process(x[i:i + chunk]) for i in range(0, len(x), chunk)]
        outs.append(r2.flush())
        b = np.concatenate(outs)
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)

    def test_multichannel_fused_equals_chain(self, monkeypatch):
        rf = make(48000, 8000, ch=3)
        rc = make(48000, 8000, ch=3, fused=False, monkeypatch=monkeypatch)
        chans = [signals.sine(5000, f, 48000) for f in (300.0, 600.0, 900.0)]
        a = [np.concatenate([o, t]) for o, t in
             zip(rf.process_multi(chans), rf.flush_multi())]
        b = [np.concatenate([o, t]) for o, t in
             zip(rc.process_multi(chans), rc.flush_multi())]
        for ai, bi in zip(a, b):
            np.testing.assert_allclose(ai, bi, rtol=1e-9, atol=1e-11)

    def test_reset_reproducibility(self):
        r = make(48000, 8000)
        x = signals.sine(4000, 500.0, 48000)
        a = np.concatenate([r.process(x), r.flush()])
        r.reset()
        b = np.concatenate([r.process(x), r.flush()])
        np.testing.assert_array_equal(a, b)

    def test_short_input_all_output_via_flush(self):
        # issue #37 analog on the fused path: input shorter than total
        # latency must still surface the tone through flush.
        r = make(48000, 8000)
        assert r._fused is not None
        x = signals.sine(2000, 500.0, 48000)
        y = np.concatenate([r.process(x), r.flush()])
        assert len(y) == pytest.approx(2000 / 6, abs=30)
        assert np.abs(y).max() > 0.8

    def test_strict_pipeline_fuses(self, monkeypatch):
        cfg = gar.Config(48000, 8000, quality=gar.QualitySpec(
            preset=gar.QualityPreset.VERY_HIGH), strict_antialias=True)
        rf = gar.new_resampler(cfg)
        if rf._fused is None:
            pytest.skip("strict chain not fusable")
        monkeypatch.setenv("GAR_TPU_FUSE_PIPELINE", "0")
        rc = gar.new_resampler(gar.Config(
            48000, 8000, quality=gar.QualitySpec(
                preset=gar.QualityPreset.VERY_HIGH), strict_antialias=True))
        monkeypatch.delenv("GAR_TPU_FUSE_PIPELINE")
        x = signals.sine(6000, 700.0, 48000)
        a = np.concatenate([rf.process(x), rf.flush()])
        b = np.concatenate([rc.process(x), rc.flush()])
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11)


class TestPartialFusion:
    """When a stage blocks whole-chain fusion, the exact half-band runs
    around it still collapse into composite segments (api._build_exec),
    and the segmented chain equals the per-stage chain bit-tightly."""

    @pytest.mark.parametrize("inr,outr", [
        (48000, 8000.1),     # 2 half-bands + non-exact residual
        (192000, 8000.1),    # 4 half-bands + non-exact residual
    ])
    def test_segments_and_parity(self, inr, outr, monkeypatch):
        cfg = dict(channels=1, max_input_size=4096,
                   quality=gar.QualitySpec(preset=gar.QualityPreset.HIGH),
                   dtype=np.float64)
        r = gar.new_resampler(gar.Config(inr, outr, **cfg))
        # not fully fused, but fewer segments than stages
        assert r._fused is None
        assert len(r._exec) < len(r._engines)
        assert any(getattr(e.plan, 'kind', '') == 'banded' for e in r._exec)

        x = RNG.normal(size=int(inr)) * 0.5
        y1 = np.concatenate([r.process(x), r.flush()])
        monkeypatch.setenv("GAR_TPU_FUSE_PIPELINE", "0")
        r2 = gar.new_resampler(gar.Config(inr, outr, **cfg))
        y2 = np.concatenate([r2.process(x), r2.flush()])
        assert len(y1) == len(y2)
        assert np.abs(y1 - y2).max() < 1e-9

        # reset clears composite-segment state too
        r.reset()
        y3 = np.concatenate([r.process(x), r.flush()])
        np.testing.assert_array_equal(y1, y3)
