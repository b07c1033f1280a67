"""Edge-case matrix, reset-state equivalence, and mutation checks.

Per-topology ports of the reference tiers (applied to the composed
EngineCore — stages here are pure functions, so the stateful unit under
test is the engine):

- edge_cases_test.go:19-497  (empty / single-sample / small-buffer / DC /
  extreme values / invalid construction)
- reset_state_test.go        (reset equivalence, multiple resets,
  mid-stream reset, statistics reset)
- buffer_integrity_test.go   (returned outputs must survive later calls)

Plus mutation checks proving the length-model and host-walk tests can
catch injected off-by-one bugs (VERDICT r1 acceptance criterion for the
test tier).
"""

import numpy as np
import pytest

from go_audio_resampler_tpu.engine import (EngineCore, plan_engine, oneshot,
                                           EngineConfigError)
from go_audio_resampler_tpu.filterdesign import Quality

from oracle import oracle_oneshot
from test_engine_core import TOPOLOGIES

RNG = np.random.default_rng(99)


def tone(n, rate, freq=997.0):
    t = np.arange(n) / rate
    return (np.sin(2 * np.pi * freq * t) * 0.9).astype(np.float64)


def run_stream(plan, x, chunks=None, block=512):
    eng = EngineCore(plan, batch=1, block=block, dtype=np.float64)
    outs = []
    if chunks is None:
        outs.append(eng.process(x)[0])
    else:
        off = 0
        for c in chunks:
            outs.append(eng.process(x[off:off + c])[0])
            off += c
        assert off == len(x)
    outs.append(eng.flush()[0])
    return np.concatenate(outs)


class TestEmptyInput:
    """edge_cases_test.go:19-101 / 252-285."""

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES)
    def test_empty_oneshot(self, inr, outr, q, kind):
        plan = plan_engine(inr, outr, q)
        y = np.asarray(oneshot(plan, np.zeros((1, 0)), dtype=np.float64))
        assert y.shape == (1, 0)

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES)
    def test_empty_process_then_signal(self, inr, outr, q, kind):
        plan = plan_engine(inr, outr, q)
        x = tone(1500, inr)
        expect = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        e = eng.process(np.zeros((1, 0)))
        assert e.shape == (1, 0)
        got = np.concatenate([eng.process(x)[0], eng.flush()[0]])
        np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-12)

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES)
    def test_flush_without_input(self, inr, outr, q, kind):
        # Never-fed flush guard (issue #30, polyphase_stage.go:328-344):
        # no input -> no output, no error.
        plan = plan_engine(inr, outr, q)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        y = eng.flush()
        assert y.shape == (1, 0)


class TestSingleSample:
    """edge_cases_test.go:101-163."""

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES)
    def test_single_sample_stream(self, inr, outr, q, kind):
        plan = plan_engine(inr, outr, q)
        x = np.array([0.7])
        expect = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
        got = run_stream(plan, x)
        assert got.shape == expect.shape == (plan.lengths.canonical(1),)
        np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-12)


class TestSmallBuffers:
    """edge_cases_test.go:164-251: tiny chunk streaming == one-shot."""

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES)
    def test_tiny_chunks(self, inr, outr, q, kind):
        plan = plan_engine(inr, outr, q)
        chunks = [1, 2, 3, 5, 7, 11, 471]
        n = sum(chunks)
        x = tone(n, inr)
        expect = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
        got = run_stream(plan, x, chunks=chunks)
        assert got.shape == expect.shape
        np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-12)


class TestDCSignal:
    """edge_cases_test.go:286-360: DC in -> DC out at unity gain."""

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES)
    def test_dc_steady_state(self, inr, outr, q, kind):
        plan = plan_engine(inr, outr, q)
        y = np.asarray(oneshot(plan, np.ones((1, 4000)), dtype=np.float64))[0]
        mid = y[len(y) // 3: 2 * len(y) // 3]
        tol = 1e-2 if q is Quality.QUICK else 1e-3
        assert abs(mid.mean() - 1.0) < tol, f"DC gain {mid.mean():.6f}"
        assert np.all(np.isfinite(y))


class TestExtremeValues:
    """edge_cases_test.go:361-441."""

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES)
    @pytest.mark.parametrize("scale", [1e-300, 1e300])
    def test_extreme_magnitudes(self, inr, outr, q, kind, scale):
        plan = plan_engine(inr, outr, q)
        x = np.full((1, 600), scale)
        y = np.asarray(oneshot(plan, x, dtype=np.float64))
        assert np.all(np.isfinite(y))

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES[:4])
    def test_alternating_extremes(self, inr, outr, q, kind):
        plan = plan_engine(inr, outr, q)
        x = np.tile([1e300, -1e300], 300)[None, :]
        y = np.asarray(oneshot(plan, x, dtype=np.float64))
        assert not np.isnan(y).any()


class TestInvalidConstruction:
    """edge_cases_test.go:442-530."""

    def test_invalid_rates(self):
        for inr, outr in [(0, 48000), (48000, 0), (-1, 48000),
                          (48000, -1), (float('nan'), 48000),
                          (48000, float('nan')), (float('inf'), 48000)]:
            with pytest.raises(EngineConfigError):
                plan_engine(inr, outr, Quality.HIGH)

    def test_ratio_clamps(self):
        # [1/256, 256] (resampler.go:62-66)
        plan_engine(1.0, 256.0, Quality.LOW)
        plan_engine(256.0, 1.0, Quality.LOW)
        with pytest.raises(EngineConfigError):
            plan_engine(1.0, 257.0, Quality.LOW)
        with pytest.raises(EngineConfigError):
            plan_engine(257.0, 1.0, Quality.LOW)


class TestResetState:
    """reset_state_test.go: Reset() returns the engine to pristine state."""

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES)
    def test_reset_equivalence(self, inr, outr, q, kind):
        plan = plan_engine(inr, outr, q)
        x = tone(1200, inr)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        a = np.concatenate([eng.process(x)[0], eng.flush()[0]])
        eng.reset()
        b = np.concatenate([eng.process(x)[0], eng.flush()[0]])
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES[:6])
    def test_mid_stream_reset_discards_state(self, inr, outr, q, kind):
        # reset_state_test.go:274-370: a reset mid-stream must produce the
        # same output as a fresh engine.
        plan = plan_engine(inr, outr, q)
        x = tone(1200, inr)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        eng.process(RNG.standard_normal((1, 700)))   # pollute state
        eng.reset()
        got = np.concatenate([eng.process(x)[0], eng.flush()[0]])
        fresh = run_stream(plan, x)
        np.testing.assert_array_equal(got, fresh)

    def test_multiple_resets(self):
        # reset_state_test.go:216-273
        plan = plan_engine(44100, 48000, Quality.HIGH)
        x = tone(900, 44100)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        runs = []
        for _ in range(3):
            runs.append(np.concatenate([eng.process(x)[0], eng.flush()[0]]))
            eng.reset()
        np.testing.assert_array_equal(runs[0], runs[1])
        np.testing.assert_array_equal(runs[0], runs[2])

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES)
    def test_statistics_reset(self, inr, outr, q, kind):
        # reset_state_test.go:371-430
        plan = plan_engine(inr, outr, q)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        eng.process(tone(777, inr))
        eng.flush()
        assert eng.get_statistics()["samplesIn"] == 777
        assert eng.get_statistics()["samplesOut"] == \
            plan.lengths.canonical(777)
        eng.reset()
        stats = eng.get_statistics()
        assert stats == {"samplesIn": 0, "samplesOut": 0}


class TestBufferIntegrity:
    """buffer_integrity_test.go:18-400 across all topologies."""

    @pytest.mark.parametrize("inr,outr,q,kind", TOPOLOGIES)
    def test_outputs_survive_later_calls(self, inr, outr, q, kind):
        plan = plan_engine(inr, outr, q)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        y1 = eng.process(tone(1024, inr))
        snap1 = y1.copy()
        y2 = eng.process(RNG.standard_normal((1, 1024)))
        snap2 = y2.copy()
        eng.flush()
        np.testing.assert_array_equal(y1, snap1)
        np.testing.assert_array_equal(y2, snap2)

    def test_process_after_flush_raises(self):
        plan = plan_engine(44100, 48000, Quality.HIGH)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        eng.process(tone(100, 44100))
        eng.flush()
        with pytest.raises(RuntimeError):
            eng.process(tone(10, 44100))

    def test_double_flush_returns_empty(self):
        plan = plan_engine(44100, 48000, Quality.HIGH)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        eng.process(tone(100, 44100))
        first = eng.flush()
        assert first.shape[1] == plan.lengths.canonical(100)
        assert eng.flush().shape == (1, 0)


class TestMutationDetection:
    """The length-model/oracle tests must catch injected off-by-ones.

    Note the canonical count is structurally *insensitive* to tap-count
    mutations (the reference's flush pads exactly ``taps`` zeros, so
    ``num_in = hist - taps + 1`` and the pad cancel) — the meaningful
    injection point is the per-call output count itself.
    """

    def test_sim_output_count_off_by_one_detected(self, monkeypatch):
        # Emulate an off-by-one in counts.PolyphaseSim.process (e.g.
        # `hist - taps` instead of `hist - taps + 1` shifting one output):
        # the LengthModel-vs-oracle test tier must trip.
        from go_audio_resampler_tpu.engine import counts
        orig = counts.PolyphaseSim.process

        def bad_process(self, n):
            out = orig(self, n)
            return max(out - 1, 0) if out else out

        monkeypatch.setattr(counts.PolyphaseSim, "process", bad_process)
        plan = plan_engine(44100, 48000, Quality.HIGH)
        mismatch = any(
            plan.lengths.canonical(n) != len(oracle_oneshot(plan,
                                                            np.zeros(n)))
            for n in (1, 7, 100, 1000))
        assert mismatch, "off-by-one in PolyphaseSim.process undetected"

    def test_decim_phase_off_by_one_detected(self, monkeypatch):
        # Same for the decimation phase carry (dft_stage.go:541 semantics).
        from go_audio_resampler_tpu.engine import counts
        orig = counts.DecimationSim.process

        def bad_process(self, n):
            out = orig(self, n)
            self.phase = (self.phase + 1) % self.factor
            return out

        monkeypatch.setattr(counts.DecimationSim, "process", bad_process)
        plan = plan_engine(96000, 48000, Quality.HIGH)
        mismatch = any(
            plan.lengths.canonical(n) != len(oracle_oneshot(plan,
                                                            np.zeros(n)))
            for n in (1, 7, 100, 1000, 4097))
        assert mismatch, "decimation phase off-by-one undetected"

    def test_host_walk_off_by_one_detected(self, monkeypatch):
        # oneshot's host-side phase walk feeds the device program constant
        # indices; an off-by-one there must trip the oracle comparison.
        # Quarantined rate pair: this plan is used nowhere else, so the
        # poisoned jit cache entry cannot leak into other tests.
        import sys
        oneshot_mod = sys.modules['go_audio_resampler_tpu.engine.oneshot']
        orig = oneshot_mod._poly_walk_host

        def bad_walk(plan, count):
            div, phase, frac = orig(plan, count)
            return div + 1, phase, frac

        plan = plan_engine(12345, 23456, Quality.LOW)
        assert plan.kind == 'two_stage' and not plan.is_rational_exact
        x = tone(500, 12345)
        expect = oracle_oneshot(plan, x)
        monkeypatch.setattr(oneshot_mod, "_poly_walk_host", bad_walk)
        try:
            got = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
        except AssertionError:
            return  # caught by the internal flush-coverage guard: detected
        assert got.shape == expect.shape
        assert np.abs(got - expect).max() > 1e-6, \
            "off-by-one in the host phase walk undetected"
