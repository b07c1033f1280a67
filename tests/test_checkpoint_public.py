"""Checkpoint/resume completeness (round-4 VERDICT item 3).

Two gaps closed here, each with a bit-identical-resume test:

1. The banded composite's aperiodic-head input prefix (``_head_x``) is
   part of the engine snapshot: a checkpoint taken BEFORE the head region
   drains must resume with the exact head rows, not a zero prefix.
2. The public ``api.Resampler`` (the ``New()`` pipeline path, fused by
   default) snapshots every execution segment plus its own output queue /
   counters / entry mode — the reference's streaming-state analog
   enumerates ALL state including inter-stage buffers
   (internal/pipeline/buffer.go:12-172).
"""

from __future__ import annotations

import numpy as np
import pytest

import go_audio_resampler_tpu as gar
from go_audio_resampler_tpu.engine import (
    EngineCore, plan_engine, save_stream_state, load_stream_state,
    save_resampler_state, load_resampler_state)
from go_audio_resampler_tpu.filterdesign import Quality
from go_audio_resampler_tpu.pipeline.fused import BandedPlan, fuse_chain
from go_audio_resampler_tpu.utils import signals

RNG = np.random.default_rng(11)


def _banded_head_plan():
    plans = [plan_engine(48000.0, 24000.0, Quality.HIGH),
             plan_engine(24000.0, 22050.0, Quality.HIGH, True)]
    op = fuse_chain(plans)
    assert op is not None and op.n_head > 0
    return BandedPlan(op, ratio=22050.0 / 48000.0)


def _mk_resampler(channels=1, dtype=np.float64):
    return gar.new_resampler(gar.Config(
        48000, 8000, channels=channels,
        quality=gar.QualitySpec(preset=gar.QualityPreset.HIGH),
        dtype=dtype))


class TestBandedHeadCheckpoint:

    def test_resume_mid_head_bit_identical(self, tmp_path):
        """Snapshot before the aperiodic head drains; resume must emit the
        exact head rows (requires _head_x in the payload)."""
        plan = _banded_head_plan()
        n_head = plan.op.n_head
        x = RNG.standard_normal((1, 20000))

        full_eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        full = np.concatenate([full_eng.process(x), full_eng.flush()],
                              axis=1)

        eng_a = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        part1 = eng_a.process(x[:, :1024])
        assert eng_a.samples_out < n_head, (
            "test must snapshot INSIDE the head region "
            f"({eng_a.samples_out} >= {n_head})")
        assert eng_a._head_x.shape[1] > 0
        ckpt = tmp_path / "mid_head.npz"
        save_stream_state(eng_a, ckpt)

        eng_b = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        load_stream_state(eng_b, ckpt)
        resumed = np.concatenate(
            [part1, eng_b.process(x[:, 1024:]), eng_b.flush()], axis=1)
        np.testing.assert_array_equal(resumed, full)

    def test_legacy_snapshot_without_head_rejected_in_head_region(
            self, tmp_path):
        plan = _banded_head_plan()
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        eng.process(RNG.standard_normal((1, 1024)))
        assert eng.samples_out < plan.op.n_head
        ckpt = tmp_path / "full.npz"
        save_stream_state(eng, ckpt)
        # Simulate a pre-round-4 file: same payload minus head_x.
        with np.load(ckpt, allow_pickle=False) as data:
            stripped = {k: data[k] for k in data.files if k != "head_x"}
        legacy = tmp_path / "legacy.npz"
        np.savez(legacy, **stripped)
        eng2 = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        with pytest.raises(ValueError, match="head"):
            load_stream_state(eng2, legacy)

    def test_cross_config_restore_rejected(self, tmp_path):
        eng = EngineCore(plan_engine(44100.0, 48000.0, Quality.HIGH),
                         batch=1, block=512, dtype=np.float64)
        ckpt = tmp_path / "a.npz"
        save_stream_state(eng, ckpt)
        other = EngineCore(plan_engine(44100.0, 48000.0, Quality.VERY_HIGH),
                           batch=1, block=512, dtype=np.float64)
        with pytest.raises(ValueError):
            load_stream_state(other, ckpt)

    def test_same_geometry_different_coeffs_rejected(self, tmp_path):
        """BandedPlan.fingerprint must hash coefficient CONTENT: two
        composites with identical banded geometry (P/I/W/lam) but
        different filters may not exchange checkpoints (the documented
        loud-failure contract for cross-config restores)."""
        import dataclasses

        plan = _banded_head_plan()
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        eng.process(RNG.standard_normal((1, 4096)))
        ckpt = tmp_path / "banded.npz"
        save_stream_state(eng, ckpt)

        op2 = dataclasses.replace(plan.op, R=plan.op.R * (1.0 + 1e-6))
        plan2 = BandedPlan(op2, ratio=plan.ratio)
        assert plan2.fingerprint != plan.fingerprint
        other = EngineCore(plan2, batch=1, block=512, dtype=np.float64)
        with pytest.raises(ValueError, match="fingerprint"):
            load_stream_state(other, ckpt)


class TestResamplerCheckpoint:

    def test_mono_resume_bit_identical(self, tmp_path):
        x = signals.sine(30000, 440.0, 48000.0)
        r_full = _mk_resampler()
        full = np.concatenate([r_full.process(x), r_full.flush()])

        r_a = _mk_resampler()
        assert r_a._fused is not None     # the default fused path
        part1 = r_a.process(x[:13000])
        ckpt = tmp_path / "resampler.npz"
        save_resampler_state(r_a, ckpt)

        r_b = _mk_resampler()
        load_resampler_state(r_b, ckpt)
        resumed = np.concatenate([part1, r_b.process(x[13000:]),
                                  r_b.flush()])
        np.testing.assert_array_equal(resumed, full)

    def test_multichannel_resume_bit_identical(self, tmp_path):
        chans = [signals.sine(24000, f, 48000.0) for f in (300.0, 700.0)]
        r_full = _mk_resampler(channels=2)
        full = [np.concatenate([o, t]) for o, t in
                zip(r_full.process_multi(chans), r_full.flush_multi())]

        r_a = _mk_resampler(channels=2)
        p1 = r_a.process_multi([c[:9000] for c in chans])
        ckpt = tmp_path / "multi.npz"
        save_resampler_state(r_a, ckpt)

        r_b = _mk_resampler(channels=2)
        load_resampler_state(r_b, ckpt)
        p2 = r_b.process_multi([c[9000:] for c in chans])
        p3 = r_b.flush_multi()
        for i in range(2):
            np.testing.assert_array_equal(
                np.concatenate([p1[i], p2[i], p3[i]]), full[i])

    def test_entry_mode_and_queue_survive(self, tmp_path):
        """The wrapper's own state (entry-mode guard, output queue) is
        part of the snapshot, not just the engines'."""
        chans = [signals.sine(6000, 500.0, 48000.0)] * 2
        r_a = _mk_resampler(channels=2)
        r_a.process_multi(chans)
        ckpt = tmp_path / "mode.npz"
        save_resampler_state(r_a, ckpt)
        r_b = _mk_resampler(channels=2)
        load_resampler_state(r_b, ckpt)
        assert r_b._entry_mode == 'multi'
        with pytest.raises(gar.ResamplerError, match="mix"):
            r_b.process(chans[0])
        # Output queue round-trips: warm past the startup drop, build a
        # near-block backlog with a sub-block call, then a process_into
        # whose combined release exceeds its own estimate_output limit —
        # the surplus is queued (surplus = blk/6 - 66 > 0 samples here).
        r_c = _mk_resampler()
        blk = r_c._fused.block
        r_c.process(signals.sine(2 * blk, 500.0, 48000.0))   # drop drained
        r_c.process(np.zeros(blk - 6))    # sub-block: buffered, 0 emitted
        n2 = blk + 12
        x2 = signals.sine(n2, 500.0, 48000.0)
        buf = np.zeros(r_c.estimate_output(n2))
        r_c.process_into(x2, buf)
        assert r_c._out_queue.shape[1] > 0, \
            "construction must leave a queued surplus"
        ck2 = tmp_path / "queue.npz"
        save_resampler_state(r_c, ck2)
        r_d = _mk_resampler()
        load_resampler_state(r_d, ck2)
        np.testing.assert_array_equal(r_d._out_queue, r_c._out_queue)
        a = np.concatenate([r_c.process(x2), r_c.flush()])
        b = np.concatenate([r_d.process(x2), r_d.flush()])
        np.testing.assert_array_equal(a, b)

    def test_flushed_flag_survives(self, tmp_path):
        r = _mk_resampler()
        r.process(signals.sine(6000, 500.0, 48000.0))
        r.flush()
        ckpt = tmp_path / "flushed.npz"
        save_resampler_state(r, ckpt)
        r2 = _mk_resampler()
        load_resampler_state(r2, ckpt)
        with pytest.raises(gar.ResamplerError):
            r2.process(np.zeros(100))

    def test_config_mismatch_rejected(self, tmp_path):
        r = _mk_resampler()
        ckpt = tmp_path / "cfg.npz"
        save_resampler_state(r, ckpt)
        r2 = _mk_resampler(channels=2)
        with pytest.raises(ValueError, match="channel"):
            load_resampler_state(r2, ckpt)
        r3 = gar.new_resampler(gar.Config(
            48000, 8000,
            quality=gar.QualitySpec(preset=gar.QualityPreset.VERY_HIGH),
            dtype=np.float64))
        if len(r3._exec) == len(r._exec):
            with pytest.raises(ValueError, match="fingerprint"):
                load_resampler_state(r3, ckpt)

    def test_wrong_file_kind_rejected(self, tmp_path):
        eng = EngineCore(plan_engine(44100.0, 48000.0, Quality.HIGH),
                         batch=1, block=512, dtype=np.float64)
        ckpt = tmp_path / "engine.npz"
        save_stream_state(eng, ckpt)
        r = _mk_resampler()
        with pytest.raises((ValueError, KeyError)):
            load_resampler_state(r, ckpt)

    def test_stub_segment_in_checkpoint_rejected(self, tmp_path):
        """A checkpoint whose segment i is a stub may not restore into a
        resampler whose segment i is an EngineCore: both mismatch
        directions must raise the diagnostic ValueError, not leak a
        KeyError from the missing engine keys."""
        r = _mk_resampler()
        ckpt = tmp_path / "real.npz"
        save_resampler_state(r, ckpt)
        with np.load(ckpt, allow_pickle=False) as data:
            payload = {k: data[k] for k in data.files
                       if not k.startswith("e0_")}
        payload["e0_stub"] = np.array([0, 0], dtype=np.int64)
        forged = tmp_path / "stubbed.npz"
        np.savez(forged, **payload)
        r2 = _mk_resampler()
        with pytest.raises(ValueError, match="kind mismatch"):
            load_resampler_state(r2, forged)

class TestVRCheckpoint:
    """VariableRateResampler snapshots: the ratio trajectory (incl. a
    live slew), device carries and the host hold must all survive; the
    closed-form position model makes continuation bit-identical."""

    def _mk(self, **kw):
        from go_audio_resampler_tpu.engine import VariableRateResampler
        return VariableRateResampler(4.0, 44100.0 / 48000.0, batch=2,
                                     block=512, dtype=np.float64, **kw)

    @pytest.mark.parametrize("quality", ["vr", "vr-hq"])
    def test_bit_identical_resume_mid_slew(self, tmp_path, quality):
        from go_audio_resampler_tpu.engine import (save_vr_state,
                                                   load_vr_state)
        va, vb = self._mk(quality=quality), self._mk(quality=quality)
        x1 = RNG.standard_normal((2, 1800)) * 0.5
        x2 = RNG.standard_normal((2, 1500)) * 0.5
        va.process(x1)
        va.set_io_ratio(0.5, slew_len=4000)   # snapshot lands MID-slew
        va.process(x2)
        p = tmp_path / "vr.npz"
        save_vr_state(va, p)
        load_vr_state(vb, p)
        assert vb.get_statistics() == va.get_statistics()
        x3 = RNG.standard_normal((2, 2200)) * 0.5
        ya = np.concatenate([va.process(x3), va.flush()], axis=1)
        yb = np.concatenate([vb.process(x3), vb.flush()], axis=1)
        np.testing.assert_array_equal(ya, yb)
        assert ya.shape[1] > 0

    def test_cross_config_restore_rejected(self, tmp_path):
        from go_audio_resampler_tpu.engine import (save_vr_state,
                                                   load_vr_state)
        va = self._mk()
        p = tmp_path / "vr.npz"
        save_vr_state(va, p)
        other = self._mk(quality="vr-hq")
        with pytest.raises(ValueError, match="configuration"):
            load_vr_state(other, p)

    def test_wrong_file_rejected(self, tmp_path):
        from go_audio_resampler_tpu.engine import (EngineCore, plan_engine,
                                                   save_stream_state,
                                                   load_vr_state)
        eng = EngineCore(plan_engine(44100.0, 48000.0, Quality.HIGH),
                         batch=1, block=512, dtype=np.float64)
        p = tmp_path / "eng.npz"
        save_stream_state(eng, p)
        with pytest.raises(ValueError, match="VR state"):
            load_vr_state(self._mk(), p)
