"""Long-stream soak: minutes of audio through the streaming engine.

The reference's bounded-memory guarantee (SURVEY section 5 "long-sequence
streaming") is exercised at realistic durations: a 30-second stream fed
in randomized chunks must equal the one-shot, a checkpoint taken at a
RANDOM position must resume bit-identically, and the engine's host-side
state must stay bounded (no growth with stream length).
"""

from __future__ import annotations

import numpy as np
import pytest

from go_audio_resampler_tpu.engine import (
    EngineCore, plan_engine, oneshot, save_stream_state, load_stream_state)
from go_audio_resampler_tpu.filterdesign import Quality

RNG = np.random.default_rng(83)


def _chunks(n, rng):
    cuts = [0]
    while cuts[-1] < n:
        cuts.append(min(n, cuts[-1] + int(rng.integers(1, 70000))))
    return cuts


class TestLongStreamSoak:

    def test_30s_stream_matches_oneshot(self):
        n = 30 * 44100
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        x = (RNG.standard_normal((1, n)) * 0.5)
        ref = np.asarray(oneshot(plan, x, dtype=np.float64))
        eng = EngineCore(plan, batch=1, block=8192, dtype=np.float64)
        cuts = _chunks(n, np.random.default_rng(5))
        outs = [eng.process(x[:, a:b])
                for a, b in zip(cuts, cuts[1:])]
        outs.append(eng.flush())
        got = np.concatenate(outs, axis=1)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)

    def test_bounded_host_state(self):
        # The input FIFO and head prefix must not grow with stream length
        # (bounded-memory streaming, doc.go:38 analog).
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=1, block=2048, dtype=np.float64)
        for _ in range(40):
            eng.process(RNG.standard_normal((1, 12345)) * 0.5)
        assert eng._pending.available() < 2 * eng.block
        cap = getattr(eng._pending, "_buf", np.zeros((1, 0))).shape[-1]
        assert cap <= 8 * max(eng.block, 12345)

    @pytest.mark.parametrize("seed", range(3))
    def test_checkpoint_at_random_position(self, tmp_path, seed):
        rng = np.random.default_rng(900 + seed)
        n = int(rng.integers(50_000, 200_000))
        cut = int(rng.integers(1, n))
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        x = rng.standard_normal((1, n)) * 0.5

        full_eng = EngineCore(plan, batch=1, block=2048, dtype=np.float64)
        full = np.concatenate([full_eng.process(x), full_eng.flush()],
                              axis=1)

        a = EngineCore(plan, batch=1, block=2048, dtype=np.float64)
        part = a.process(x[:, :cut])
        ck = tmp_path / f"soak{seed}.npz"
        save_stream_state(a, ck)
        b = EngineCore(plan, batch=1, block=2048, dtype=np.float64)
        load_stream_state(b, ck)
        resumed = np.concatenate(
            [part, b.process(x[:, cut:]), b.flush()], axis=1)
        np.testing.assert_array_equal(resumed, full)
