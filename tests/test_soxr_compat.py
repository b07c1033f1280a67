"""python-soxr compatibility shim (soxr_compat) tests.

Pins the drop-in surface: quality-string mapping, frame-major layouts,
integer dtype scaling, and that the chunked stream equals the one-shot
resample (python-soxr's own contract; chunking-invariance analog of
processinto_test.go:562).
"""

import numpy as np
import pytest

from go_audio_resampler_tpu import soxr_compat as soxr
from go_audio_resampler_tpu import convenience


def _sine(n, rate, freq=997.0, dtype=np.float32):
    t = np.arange(n) / rate
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(dtype)


class TestResampleOneShot:
    def test_mono_matches_convenience(self):
        x = _sine(20000, 44100, dtype=np.float64)
        y = soxr.resample(x, 44100, 48000, quality="HQ")
        ref = convenience.resample_mono(
            x, 44100, 48000, quality=soxr._QUALITY_MAP["HQ"])
        np.testing.assert_allclose(y, np.asarray(ref), rtol=0, atol=1e-12)

    def test_stereo_frame_major_channels_independent(self):
        l = _sine(8000, 44100, 500.0)
        r = _sine(8000, 44100, 1500.0)
        x = np.stack([l, r], axis=1)                 # [n, 2]
        y = soxr.resample(x, 44100, 48000)
        assert y.ndim == 2 and y.shape[1] == 2
        yl = soxr.resample(l, 44100, 48000)
        yr = soxr.resample(r, 44100, 48000)
        np.testing.assert_array_equal(y[:, 0], yl)
        np.testing.assert_array_equal(y[:, 1], yr)

    def test_dtype_preserved(self):
        for dt in (np.float32, np.float64):
            y = soxr.resample(_sine(4000, 48000, dtype=dt), 48000, 32000)
            assert y.dtype == dt

    def test_int16_round_trip_scaling(self):
        xf = _sine(8000, 44100, dtype=np.float64)
        xi = np.round(xf * 32768.0).clip(-32768, 32767).astype(np.int16)
        yi = soxr.resample(xi, 44100, 48000)
        assert yi.dtype == np.int16
        yf = soxr.resample(xi.astype(np.float64) / 32768.0, 44100, 48000)
        np.testing.assert_allclose(yi.astype(np.float64) / 32768.0, yf,
                                   atol=1.0 / 32768.0)

    @pytest.mark.parametrize("q,preset_name", [
        ("QQ", "QUICK"), ("lq", "LOW"), ("MQ", "MEDIUM"),
        ("HQ", "HIGH"), ("VHQ", "VERY_HIGH"),
        (0, "QUICK"), (4, "VERY_HIGH"),
    ])
    def test_quality_mapping(self, q, preset_name):
        assert soxr._preset(q).name == preset_name

    def test_unknown_quality_raises(self):
        with pytest.raises(ValueError, match="quality"):
            soxr.resample(_sine(100, 48000), 48000, 44100, quality="ULTRA")

    def test_bad_shapes_and_dtypes(self):
        with pytest.raises(ValueError):
            soxr.resample(np.zeros((4, 2, 2), np.float32), 48000, 44100)
        with pytest.raises(TypeError):
            soxr.resample(np.zeros(16, np.complex64), 48000, 44100)


class TestResampleStream:
    def test_chunked_equals_oneshot(self):
        x = _sine(30000, 44100, dtype=np.float32)
        st = soxr.ResampleStream(44100, 48000, 1, dtype="float32",
                                 quality="HQ")
        outs = [st.resample_chunk(x[i:i + 7000]) for i in
                range(0, len(x), 7000)]
        outs.append(st.resample_chunk(np.zeros(0, np.float32), last=True))
        y = np.concatenate(outs)
        ref = soxr.resample(x, 44100, 48000, quality="HQ")
        assert y.shape == ref.shape
        # identical walk/coefficients; block accumulation differs at f32
        # rounding scale only
        np.testing.assert_allclose(y, ref, rtol=0, atol=4e-6)

    def test_stereo_stream_shapes(self):
        x = np.stack([_sine(9000, 48000, 300.0),
                      _sine(9000, 48000, 800.0)], axis=1)
        st = soxr.ResampleStream(48000, 44100, 2)
        y1 = st.resample_chunk(x[:5000])
        y2 = st.resample_chunk(x[5000:], last=True)
        y = np.concatenate([y1, y2], axis=0)
        ref = soxr.resample(x.astype(np.float32), 48000, 44100)
        assert y.shape == ref.shape
        np.testing.assert_allclose(y, ref, rtol=0, atol=4e-6)

    def test_after_last_raises_and_clear_recovers(self):
        st = soxr.ResampleStream(48000, 44100, 1)
        x = _sine(4000, 48000)
        a1 = [st.resample_chunk(x), st.resample_chunk(x, last=True)]
        with pytest.raises(RuntimeError, match="flushed"):
            st.resample_chunk(x)
        st.clear()
        a2 = [st.resample_chunk(x), st.resample_chunk(x, last=True)]
        np.testing.assert_array_equal(np.concatenate(a1),
                                      np.concatenate(a2))

    def test_wrong_chunk_shape_raises(self):
        st = soxr.ResampleStream(48000, 44100, 2)
        with pytest.raises(ValueError, match="chunk"):
            st.resample_chunk(np.zeros(100, np.float32))

    def test_int16_stream(self):
        x = np.round(_sine(8000, 44100, dtype=np.float64)
                     * 32768.0).clip(-32768, 32767).astype(np.int16)
        st = soxr.ResampleStream(44100, 48000, 1, dtype="int16")
        y = np.concatenate([st.resample_chunk(x[:4000]),
                            st.resample_chunk(x[4000:], last=True)])
        assert y.dtype == np.int16
        ref = soxr.resample(x, 44100, 48000)
        np.testing.assert_allclose(y.astype(np.int32),
                                   ref.astype(np.int32), atol=1)

    def test_bad_channels(self):
        with pytest.raises(ValueError):
            soxr.ResampleStream(48000, 44100, 0)

    def test_mono_stream_accepts_column_chunks(self):
        x = _sine(4000, 48000)
        a = soxr.ResampleStream(48000, 44100, 1)
        b = soxr.ResampleStream(48000, 44100, 1)
        ya = np.concatenate([a.resample_chunk(x),
                             a.resample_chunk(x[:0], last=True)])
        yb = np.concatenate([b.resample_chunk(x[:, None]),
                             b.resample_chunk(x[:0], last=True)])
        np.testing.assert_array_equal(ya, yb)



class TestIntPrecisionPaths:
    def test_int32_unity_roundtrip_exact(self):
        """int32 computes at float64 (python-soxr double-path parity):
        a unity-ratio pass-through must return >24-bit int32 values
        exactly (an f32 compute path would round them)."""
        rng = np.random.default_rng(12)
        x = rng.integers(-2**31, 2**31 - 1, size=4096, dtype=np.int32)
        y = soxr.resample(x, 48000, 48000)
        assert y.dtype == np.int32
        np.testing.assert_array_equal(y[:len(x)], x)

    def test_int16_unity_roundtrip_exact(self):
        rng = np.random.default_rng(13)
        x = rng.integers(-32768, 32767, size=4096, dtype=np.int16)
        y = soxr.resample(x, 48000, 48000)
        assert y.dtype == np.int16
        np.testing.assert_array_equal(y[:len(x)], x)

    def test_x64_off_warns_and_degrades_explicitly(self):
        """With jax_enable_x64 off (the default in ANY stock process —
        the suite's conftest enables it globally, which is why the
        exactness tests above pass), the f64 compute path cannot exist:
        the shim must WARN and degrade to f32 rather than silently
        compute f32 while claiming the python-soxr double path."""
        import jax
        import warnings as _w

        assert jax.config.jax_enable_x64          # conftest invariant
        x = np.random.default_rng(14).integers(
            -2**31, 2**31 - 1, size=1024, dtype=np.int32)
        jax.config.update("jax_enable_x64", False)
        try:
            with pytest.warns(UserWarning, match="jax_enable_x64 is off"):
                y = soxr.resample(x, 48000, 48000)
            assert y.dtype == np.int32            # API contract holds
            # f32 path: 16 high bits survive the unity round trip.
            np.testing.assert_allclose(
                y[:len(x)].astype(np.float64), x.astype(np.float64),
                atol=2.0**8)
            with pytest.warns(UserWarning, match="jax_enable_x64 is off"):
                soxr.ResampleStream(48000, 44100, 1, dtype="int32")
            with _w.catch_warnings():
                _w.simplefilter("error")          # f32 paths stay silent
                soxr.resample(x.astype(np.float32), 48000, 44100)
        finally:
            jax.config.update("jax_enable_x64", True)
