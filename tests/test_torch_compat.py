"""torchaudio-compat shim: signature, shapes, dtypes, engine parity.

The torch twin of test_soxr_compat.py — the shim is a thin layer over
the engine one-shot, so the tests guard the LAYER (tensor plumbing,
leading-dim flattening, torchaudio's ceil length convention, validation)
against drift, with exact parity against the native API.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import go_audio_resampler_tpu as gar
from go_audio_resampler_tpu import torch_compat as F

RNG = np.random.default_rng(23)


def _native(x: np.ndarray, inr: float, outr: float,
            preset=gar.QualityPreset.HIGH) -> np.ndarray:
    y = np.asarray(gar.resample_mono(x.astype(np.float64), inr, outr, preset))
    n_out = int(math.ceil(x.shape[-1] * outr / inr))
    if y.shape[0] >= n_out:
        return y[:n_out]
    return np.concatenate([y, np.zeros(n_out - y.shape[0])])


class TestFunctional:

    def test_mono_matches_native(self):
        x = (RNG.standard_normal(5000) * 0.5).astype(np.float64)
        y = F.resample(torch.from_numpy(x), 44100, 48000)
        ref = _native(x, 44100.0, 48000.0)
        assert y.shape == (ref.shape[0],)
        np.testing.assert_allclose(y.numpy(), ref, rtol=1e-12, atol=1e-13)

    def test_length_convention_is_ceil(self):
        for n, inr, outr in [(5000, 44100, 48000), (4411, 48000, 44100),
                             (700, 96000, 48000), (1, 8000, 96000)]:
            x = torch.zeros(n)
            y = F.resample(x, inr, outr)
            assert y.shape[-1] == math.ceil(n * outr / inr), (n, inr, outr)

    def test_leading_dims_flattened(self):
        x = (RNG.standard_normal((3, 2, 2000)) * 0.5).astype(np.float64)
        y = F.resample(torch.from_numpy(x), 48000, 32000)
        assert y.shape[:2] == (3, 2)
        for i in range(3):
            for j in range(2):
                ref = _native(x[i, j], 48000.0, 32000.0)
                np.testing.assert_allclose(y[i, j].numpy(), ref,
                                           rtol=1e-12, atol=1e-13)

    def test_float32_roundtrip_dtype(self):
        x = torch.from_numpy(
            (RNG.standard_normal(3000) * 0.5).astype(np.float32))
        y = F.resample(x, 44100, 48000)
        assert y.dtype == torch.float32

    def test_equal_rates_identity(self):
        x = torch.from_numpy(RNG.standard_normal(100))
        assert F.resample(x, 48000, 48000) is x

    def test_zero_length(self):
        y = F.resample(torch.zeros(2, 0), 44100, 48000)
        assert y.shape == (2, 0)

    def test_signature_validation(self):
        x = torch.zeros(100)
        with pytest.raises(ValueError, match="method"):
            F.resample(x, 44100, 48000, resampling_method="nearest")
        with pytest.raises(ValueError, match="positive"):
            F.resample(x, -1, 48000)
        with pytest.raises(ValueError, match="width"):
            F.resample(x, 44100, 48000, lowpass_filter_width=0)
        with pytest.raises(ValueError, match="Rolloff"):
            F.resample(x, 44100, 48000, rolloff=1.5)
        with pytest.raises(TypeError, match="float"):
            F.resample(torch.zeros(10, dtype=torch.int16), 44100, 48000)
        with pytest.raises(TypeError, match="Tensor"):
            F.resample(np.zeros(10), 44100, 48000)

    def test_f64_without_x64_warns_and_degrades(self):
        """Without jax_enable_x64 a float64 tensor would silently compute
        at float32; the shim warns and degrades explicitly, mirroring
        soxr_compat._compute_dtype (round-4 advisor finding)."""
        import jax as _jax

        x = torch.from_numpy(
            (RNG.standard_normal(2000) * 0.5).astype(np.float64))
        _jax.config.update("jax_enable_x64", False)
        try:
            with pytest.warns(UserWarning, match="jax_enable_x64"):
                y = F.resample(x, 44100, 48000)
        finally:
            _jax.config.update("jax_enable_x64", True)
        assert y.dtype == torch.float64      # caller's dtype is honored
        ref = _native(x.numpy(), 44100.0, 48000.0, gar.QualityPreset.HIGH)
        # f32 compute: close to the f64 reference but not bit-equal
        np.testing.assert_allclose(y.numpy(), ref, rtol=0, atol=1e-5)

    def test_quality_keyword(self):
        x = (RNG.standard_normal(4000) * 0.5).astype(np.float64)
        y = F.resample(torch.from_numpy(x), 44100, 48000,
                       quality=gar.QualityPreset.LOW)
        ref = _native(x, 44100.0, 48000.0, gar.QualityPreset.LOW)
        np.testing.assert_allclose(y.numpy(), ref, rtol=1e-12, atol=1e-13)


class TestTransform:

    def test_matches_functional(self):
        x = torch.from_numpy(
            (RNG.standard_normal((2, 3000)) * 0.5).astype(np.float64))
        t = F.Resample(orig_freq=44100, new_freq=48000)
        np.testing.assert_array_equal(
            t(x).numpy(), F.resample(x, 44100, 48000).numpy())

    def test_default_is_identity(self):
        x = torch.from_numpy(RNG.standard_normal(50))
        assert F.Resample()(x) is x

    def test_dtype_cast(self):
        x = torch.from_numpy(
            (RNG.standard_normal(1000) * 0.5).astype(np.float32))
        t = F.Resample(44100, 48000, dtype=torch.float64)
        assert t(x).dtype == torch.float64

    def test_repr(self):
        assert "44100" in repr(F.Resample(44100, 48000))

    def test_reuse_many_calls(self):
        t = F.Resample(48000, 16000)
        for n in (1000, 2000, 1000):
            x = torch.from_numpy(
                (RNG.standard_normal(n) * 0.5).astype(np.float64))
            y = t(x)
            assert y.shape[-1] == math.ceil(n / 3)


class TestQuality:

    def test_tone_preserved(self):
        n = 44100
        t = np.arange(n) / 44100.0
        x = torch.from_numpy(
            (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float64))
        y = F.resample(x, 44100, 48000).numpy()
        seg = y[4000:36768]
        w = np.hanning(seg.size)
        f = np.fft.rfftfreq(seg.size, 1 / 48000)[
            np.argmax(np.abs(np.fft.rfft(seg * w)))]
        assert abs(f - 1000.0) < 2.0, f


class TestHalfPrecision:

    @pytest.mark.parametrize("dt", [torch.bfloat16, torch.float16])
    def test_half_dtypes_compute_at_f32(self, dt):
        # Round-4 review: bf16/f16 tensors have no torch->numpy export;
        # the shim must compute at float32 and cast back.
        x32 = (RNG.standard_normal((2, 2000)) * 0.5).astype(np.float32)
        x = torch.from_numpy(x32).to(dt)
        y = F.resample(x, 44100, 48000)
        assert y.dtype == dt and y.shape == (2, 2177)
        ref = F.resample(x.float(), 44100, 48000)
        err = (y.float() - ref).abs().max().item()
        assert err < (0.02 if dt == torch.bfloat16 else 0.002), err
