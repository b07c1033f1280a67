"""Device-resident streaming (process_device / flush_device).

The serving-path mode: input, output and all intermediate state stay
device arrays; output counts are static for the supported topologies so
the wrapper never synchronizes with the device.  The emitted stream must
equal the host-mode stream (same step functions, same length model); the
only permitted difference is the banded head region, which the device
mode computes in the engine dtype on device (float64 here, so it still
matches to rounding).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import go_audio_resampler_tpu as gar
from go_audio_resampler_tpu.engine import EngineCore, plan_engine
from go_audio_resampler_tpu.filterdesign import Quality
from go_audio_resampler_tpu.utils import signals

RNG = np.random.default_rng(7)


def _plan_cases():
    return [
        ("rational", plan_engine(44100.0, 48000.0, Quality.HIGH)),
        ("decimate", plan_engine(48000.0, 24000.0, Quality.HIGH)),
        ("dft_up", plan_engine(48000.0, 96000.0, Quality.HIGH)),
        ("strict_aa_rational",
         plan_engine(48000.0, 44100.0, Quality.HIGH, True)),
    ]


def _banded_plan():
    """Composite with an aperiodic head (downstream stage has lam > 0).

    Heads arise when a downstream stage's left zero-context reaches into
    upstream startup — a strict-antialias rational stage composed after a
    decimator is the canonical producer (compose(), pipeline/fused.py).
    """
    from go_audio_resampler_tpu.pipeline.fused import BandedPlan, fuse_chain
    plans = [plan_engine(48000.0, 24000.0, Quality.HIGH),
             plan_engine(24000.0, 22050.0, Quality.HIGH, True)]
    op = fuse_chain(plans)
    assert op is not None and op.n_head > 0
    return BandedPlan(op, ratio=22050.0 / 48000.0)


def _host_stream(plan, x, batch, block):
    eng = EngineCore(plan, batch=batch, block=block, dtype=jnp.float64)
    return np.concatenate([eng.process(x), eng.flush()], axis=1)


def _device_stream(plan, x, batch, block, n_chunks=3):
    eng = EngineCore(plan, batch=batch, block=block, dtype=jnp.float64)
    mult = eng.device_chunk_multiple
    assert mult is not None and mult >= 1
    n = x.shape[1] - (x.shape[1] % mult)
    # Uneven multiples-of-mult chunking; the sub-period remainder goes
    # through the host FIFO path at the end (mixing is allowed when no
    # host bytes are pending, i.e. before any host process call).
    per = max((n // mult) // n_chunks, 1) * mult
    outs, i = [], 0
    while i < n:
        c = min(per, n - i)
        y = eng.process_device(jnp.asarray(x[:, i:i + c]))
        assert isinstance(y, jax.Array)
        outs.append(np.asarray(y))
        i += c
    if x.shape[1] > n:          # remainder via host mode, then device flush
        outs.append(eng.process(x[:, n:]))
    y = eng.flush_device()
    assert isinstance(y, jax.Array)
    outs.append(np.asarray(y))
    return np.concatenate(outs, axis=1)


class TestDeviceModeParity:

    @pytest.mark.parametrize("name,plan", _plan_cases())
    def test_matches_host_mode(self, name, plan):
        x = RNG.standard_normal((2, 9000))
        a = _host_stream(plan, x, batch=2, block=512)
        b = _device_stream(plan, x, batch=2, block=512)
        assert a.shape == b.shape
        # Not bit-identical: XLA tiles the banded dot differently at
        # different launch widths, so summation order shifts by an ulp.
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-13)

    def test_banded_composite_matches_host(self):
        plan = _banded_plan()
        x = RNG.standard_normal((2, 12000))
        a = _host_stream(plan, x, batch=2, block=512)
        b = _device_stream(plan, x, batch=2, block=512)
        assert a.shape == b.shape
        # Head region: host computes the exact rows with numpy float64,
        # device mode with the XLA float64 matmul — same math, rounding
        # may differ in the last ulp.
        n_head = plan.op.n_head
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-13)
        assert n_head > 0, "case should exercise the head correction"

    def test_chunk_width_invariance(self):
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        x = RNG.standard_normal((1, 8000))
        a = _device_stream(plan, x, batch=1, block=512, n_chunks=1)
        b = _device_stream(plan, x, batch=1, block=512, n_chunks=5)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-13)

    def test_one_launch_whole_minute_shape(self):
        # A single big chunk is one launch; canonical count still exact.
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=1, block=512, dtype=jnp.float64)
        mult = eng.device_chunk_multiple
        n = (44100 // mult) * mult
        x = signals.sine(n, 997.0, 44100.0)[None, :]
        y = np.concatenate([np.asarray(eng.process_device(jnp.asarray(x))),
                            np.asarray(eng.flush_device())], axis=1)
        assert y.shape[1] == plan.lengths.canonical(n)


class TestDeviceModeContracts:

    def test_unsupported_topology_raises(self):
        plan = plan_engine(44100.0, 48000.0, Quality.QUICK)    # cubic
        eng = EngineCore(plan, batch=1, block=512, dtype=jnp.float64)
        assert eng.device_chunk_multiple is None
        with pytest.raises(NotImplementedError):
            eng.process_device(jnp.zeros((1, 256)))
        with pytest.raises(NotImplementedError):
            eng.flush_device()

    def test_non_multiple_chunk_raises(self):
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=1, block=512, dtype=jnp.float64)
        mult = eng.device_chunk_multiple
        assert mult > 1
        with pytest.raises(ValueError, match="multiple"):
            eng.process_device(jnp.zeros((1, mult + 1)))

    def test_pending_host_bytes_raise(self):
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=1, block=512, dtype=jnp.float64)
        eng.process(np.zeros((1, 100)))          # sub-block: stays pending
        mult = eng.device_chunk_multiple
        with pytest.raises(RuntimeError, match="pending"):
            eng.process_device(jnp.zeros((1, mult)))

    def test_process_device_after_flush_raises(self):
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=1, block=512, dtype=jnp.float64)
        eng.flush()
        with pytest.raises(RuntimeError, match="flush"):
            eng.process_device(jnp.zeros((1, eng.device_chunk_multiple)))

    def test_no_host_sync_in_process_device(self, monkeypatch):
        """The device path must not force a device->host transfer."""
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=1, block=512, dtype=jnp.float64)
        mult = eng.device_chunk_multiple
        x = jnp.asarray(RNG.standard_normal((1, 8 * mult)))

        def boom(*a, **k):                        # any __array__ = a sync
            raise AssertionError("device->host transfer inside "
                                 "process_device")
        monkeypatch.setattr(jax.Array, "__array__", boom, raising=False)
        y = eng.process_device(x)
        assert isinstance(y, jax.Array)

class TestPublicResamplerDeviceMode:
    """api.Resampler.process_multi_device / flush_multi_device — the
    device-resident serving mode on the public pipeline path (the chain
    must have fused into one static-output-count engine, the default)."""

    def _mk(self, inr=44100.0, outr=48000.0, ch=2):
        return gar.new_resampler(gar.Config(
            inr, outr, channels=ch,
            quality=gar.get_preset_spec(gar.QualityPreset.HIGH)))

    def test_parity_with_process_multi(self):
        ra, rb = self._mk(), self._mk()
        mult = rb.device_chunk_multiple
        assert mult is not None and mult >= 1
        n = 6 * mult
        x = RNG.standard_normal((2, n)) * 0.5
        host = np.stack(ra.process_multi(list(x)))
        host = np.concatenate([host, np.stack(ra.flush_multi())], axis=1)
        y1 = rb.process_multi_device(jnp.asarray(x))
        y2 = rb.flush_multi_device()
        assert isinstance(y1, jax.Array) and isinstance(y2, jax.Array)
        dev = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, rtol=1e-12, atol=1e-13)
        assert rb.samples_out == host.shape[1]
        assert rb.get_statistics() == ra.get_statistics()

    def test_downsampling_pipeline_parity(self):
        # 48k->22.05k builds a multi-stage chain that fuses into one
        # banded composite; the device path must match the host chain.
        ra = self._mk(48000.0, 22050.0)
        rb = self._mk(48000.0, 22050.0)
        mult = rb.device_chunk_multiple
        assert mult is not None
        n = 4 * mult
        x = RNG.standard_normal((2, n)) * 0.5
        host = np.stack(ra.process_multi(list(x)))
        host = np.concatenate([host, np.stack(ra.flush_multi())], axis=1)
        dev = np.concatenate([np.asarray(rb.process_multi_device(x)),
                              np.asarray(rb.flush_multi_device())], axis=1)
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, rtol=1e-12, atol=1e-13)

    def test_unfusable_chain_raises(self, monkeypatch):
        monkeypatch.setenv("GAR_TPU_FUSE_PIPELINE", "0")
        r = self._mk(48000.0, 22050.0)
        assert r.device_chunk_multiple is None
        with pytest.raises(NotImplementedError, match="segment"):
            r.process_multi_device(jnp.zeros((2, 1024)))
        with pytest.raises(NotImplementedError):
            r.flush_multi_device()
        # The failed device call must NOT have latched the entry mode:
        # the host path stays usable without a reset() (validation
        # precedes the mode latch).
        assert r._entry_mode is None
        out = r.process_multi([np.zeros(1024), np.zeros(1024)])
        assert len(out) == 2

    def test_queued_host_output_raises(self):
        # Queued host output (the limit-capped process_into holdback)
        # must block the device path: the device stream would bypass the
        # queue and reorder the output.  Seed the queue directly — the
        # guard is on the wrapper state, not on how it got there.
        r = self._mk()
        mult = r.device_chunk_multiple
        r._out_queue = np.zeros((2, 5), dtype=r.dtype)
        with pytest.raises(gar.ResamplerError, match="queued"):
            r.process_multi_device(jnp.zeros((2, mult)))
        with pytest.raises(gar.ResamplerError, match="queued"):
            r.flush_multi_device()

    def test_bad_shape_raises(self):
        r = self._mk()
        mult = r.device_chunk_multiple
        with pytest.raises(gar.InvalidConfigError, match="channels"):
            r.process_multi_device(jnp.zeros((3, mult)))

    def test_flush_device_idempotent_and_guards(self):
        r = self._mk()
        mult = r.device_chunk_multiple
        r.process_multi_device(jnp.zeros((2, 2 * mult)))
        y = r.flush_multi_device()
        assert np.asarray(r.flush_multi_device()).shape[1] == 0
        with pytest.raises(gar.ResamplerError, match="flush"):
            r.process_multi_device(jnp.zeros((2, mult)))


class TestPipelinedStream:
    """EngineCore.stream / Resampler.stream_multi: the pipelined host
    loop (one-chunk download lag) must emit the canonical stream for
    arbitrary input chunkings, both output modes, and the host-fallback
    topologies."""

    def _ref(self, plan, x, block=512):
        eng = EngineCore(plan, batch=x.shape[0], block=block,
                         dtype=np.float64)
        return np.concatenate([eng.process(x), eng.flush()], axis=1)

    @pytest.mark.parametrize("name,plan", _plan_cases())
    def test_parity_all_topologies(self, name, plan):
        x = RNG.standard_normal((2, 7001)) * 0.5
        ref = self._ref(plan, x)
        eng = EngineCore(plan, batch=2, block=512, dtype=np.float64)
        # Ragged chunking exercises the remainder buffer.
        cuts = [0, 997, 1000, 3000, 3001, 6500, 7001]
        chunks = [x[:, a:b] for a, b in zip(cuts, cuts[1:])]
        got = np.concatenate(list(eng.stream(chunks)), axis=1)
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)

    def test_banded_head_parity(self):
        plan = _banded_plan()
        x = RNG.standard_normal((1, 9000)) * 0.5
        ref = self._ref(plan, x)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        got = np.concatenate(
            list(eng.stream([x[:, :4096], x[:, 4096:]])), axis=1)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)

    def test_device_out_mode_yields_jax_arrays(self):
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        x = RNG.standard_normal((2, 6000)) * 0.5
        ref = self._ref(plan, x)
        eng = EngineCore(plan, batch=2, block=512, dtype=np.float64)
        outs = list(eng.stream([x[:, :2000], x[:, 2000:]], out='device'))
        assert all(isinstance(o, jax.Array) for o in outs)
        got = np.concatenate([np.asarray(o) for o in outs], axis=1)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)

    def test_host_fallback_topology(self):
        # Cubic (QUICK) has data-dependent counts: stream() must fall
        # back to the synchronous host path and still match.
        plan = plan_engine(44100.0, 48000.0, Quality.QUICK)
        assert EngineCore(plan, batch=1).device_chunk_multiple is None
        x = RNG.standard_normal((1, 5000)) * 0.5
        ref = self._ref(plan, x)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        got = np.concatenate(
            list(eng.stream([x[:, :1234], x[:, 1234:]])), axis=1)
        np.testing.assert_array_equal(got, ref)
        with pytest.raises(NotImplementedError, match="device"):
            eng2 = EngineCore(plan, batch=1, block=512, dtype=np.float64)
            list(eng2.stream([x], out='device'))

    def test_empty_and_tiny_chunks(self):
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        x = RNG.standard_normal((1, 3000)) * 0.5
        ref = self._ref(plan, x)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        chunks = [x[:, :0]] + [x[:, i:i + 100] for i in range(0, 3000, 100)]
        got = np.concatenate(list(eng.stream(chunks)), axis=1)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)

    def test_public_stream_multi_parity(self):
        ra = gar.new_resampler(gar.Config(
            48000, 8000, channels=2,
            quality=gar.QualitySpec(preset=gar.QualityPreset.HIGH),
            dtype=np.float64))
        rb = gar.new_resampler(gar.Config(
            48000, 8000, channels=2,
            quality=gar.QualitySpec(preset=gar.QualityPreset.HIGH),
            dtype=np.float64))
        x = RNG.standard_normal((2, 20000)) * 0.5
        host = np.stack(ra.process_multi(list(x)))
        host = np.concatenate([host, np.stack(ra.flush_multi())], axis=1)
        got = np.concatenate(
            list(rb.stream_multi([x[:, :7000], x[:, 7000:]])), axis=1)
        assert got.shape == host.shape
        np.testing.assert_allclose(got, host, rtol=1e-9, atol=1e-12)
        assert rb.samples_in == 20000
        assert rb.samples_out == host.shape[1]
        with pytest.raises(gar.ResamplerError, match="flush"):
            rb.process_multi([x[0], x[1]])

    def test_public_stream_multi_unfused_fallback(self, monkeypatch):
        monkeypatch.setenv("GAR_TPU_FUSE_PIPELINE", "0")
        ra = gar.new_resampler(gar.Config(
            48000, 22050, channels=2,
            quality=gar.QualitySpec(preset=gar.QualityPreset.HIGH),
            dtype=np.float64))
        rb = gar.new_resampler(gar.Config(
            48000, 22050, channels=2,
            quality=gar.QualitySpec(preset=gar.QualityPreset.HIGH),
            dtype=np.float64))
        assert len(rb._exec) > 1
        x = RNG.standard_normal((2, 12000)) * 0.5
        host = np.stack(ra.process_multi(list(x)))
        host = np.concatenate([host, np.stack(ra.flush_multi())], axis=1)
        got = np.concatenate(
            list(rb.stream_multi([x[:, :5000], x[:, 5000:]])), axis=1)
        np.testing.assert_array_equal(got, host)
        with pytest.raises(NotImplementedError):
            r3 = gar.new_resampler(gar.Config(
                48000, 22050, channels=2,
                quality=gar.QualitySpec(preset=gar.QualityPreset.HIGH),
                dtype=np.float64))
            list(r3.stream_multi([x], out='device'))

    @staticmethod
    def _mk_public(inr=44100.0, outr=48000.0):
        return gar.new_resampler(gar.Config(
            inr, outr, channels=2,
            quality=gar.get_preset_spec(gar.QualityPreset.HIGH)))

    def test_stream_multi_validates_eagerly(self):
        # Not a generator surprise: bad arguments fail at CALL time.
        r = self._mk_public()
        with pytest.raises(ValueError, match="out must be"):
            r.stream_multi([], out="Device")
        r2 = self._mk_public()
        r2.flush_multi()
        with pytest.raises(gar.ResamplerError, match="flush"):
            r2.stream_multi([])

    def test_stream_multi_unfused_bad_out_raises(self, monkeypatch):
        monkeypatch.setenv("GAR_TPU_FUSE_PIPELINE", "0")
        r = self._mk_public(48000.0, 22050.0)
        with pytest.raises(ValueError, match="out must be"):
            r.stream_multi([], out="dev")

    def test_stream_with_pending_host_input_fails_loudly(self):
        # Pre-buffered sub-block host input + chunks that DO carve a
        # device granule: the device step refuses (documented contract:
        # feed block multiples or reset) rather than corrupting counts.
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float64)
        eng.process(np.zeros((1, 100)))
        with pytest.raises(RuntimeError, match="pending"):
            list(eng.stream([np.zeros((1, 600))]))
