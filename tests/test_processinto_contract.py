"""process_into behavioral contracts probed across chunk sizes.

Counterpart of the reference's processinto_test.go tier: the
estimate_output bound must hold for every call pattern (a buffer of
estimate_output(len(chunk)) samples is ALWAYS sufficient), the
concatenated process_into stream must equal the plain process stream, and
no state advances on BufferTooSmallError.
"""

import numpy as np
import pytest

import go_audio_resampler_tpu as gar
from go_audio_resampler_tpu.utils import signals


CHUNK_PATTERNS = [
    [4096, 4096],
    [1, 1, 1, 4093, 4096],          # tiny calls after big pending
    [100] * 80,
    [7, 13, 280, 2700, 5000],
    [8191, 1],
]


class TestProcessIntoContract:
    @pytest.mark.parametrize("chunks", CHUNK_PATTERNS)
    def test_estimate_is_always_sufficient_simple(self, chunks):
        r = gar.new_engine(44100, 48000)
        x = signals.sine(sum(chunks), 997.0, 44100)
        off = 0
        produced = []
        for c in chunks:
            chunk = x[off:off + c]
            off += c
            buf = np.zeros(r.estimate_output(len(chunk)))
            n = r.process_into(chunk, buf)
            assert n <= len(buf)
            produced.append(buf[:n].copy())
        produced.append(r.flush())
        stream_into = np.concatenate(produced)

        # identical to the plain process stream (processinto_test.go:562)
        r2 = gar.new_engine(44100, 48000)
        stream_plain = np.concatenate([r2.process(x), r2.flush()])
        np.testing.assert_array_equal(stream_into, stream_plain)

    @pytest.mark.parametrize("chunks", CHUNK_PATTERNS[:3])
    def test_estimate_sufficient_pipeline_path(self, chunks):
        r = gar.new_simple(48000, 44100)
        x = signals.sine(sum(chunks), 997.0, 48000)
        off = 0
        total = 0
        for c in chunks:
            chunk = x[off:off + c]
            off += c
            buf = np.zeros(r.estimate_output(len(chunk)))
            n = r.process_into(chunk, buf)
            assert n <= len(buf)
            total += n
        total += len(r.flush())
        # the queued-output mechanism must not lose samples
        assert total == r.get_statistics()["samplesOut"]

    def test_no_state_advance_on_error_then_retry(self):
        r = gar.new_engine(44100, 48000)
        x = signals.sine(3000, 997.0, 44100)
        with pytest.raises(gar.BufferTooSmallError):
            r.process_into(x, np.zeros(10))
        # retry with a proper buffer gives the full canonical stream
        buf = np.zeros(r.estimate_output(len(x)))
        n = r.process_into(x, buf)
        tail = r.flush()
        ref = gar.resample_mono(x, 44100, 48000)
        got = np.concatenate([buf[:n], tail])
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)

    def test_float32_into(self):
        r = gar.new_resampler(gar.Config(44100, 48000))
        x = signals.sine(4096, 997.0, 44100).astype(np.float32)
        buf = np.zeros(r.estimate_output(len(x)), dtype=np.float32)
        n = r.process_float32_into(x, buf)
        assert 0 <= n <= len(buf)
        assert buf.dtype == np.float32
