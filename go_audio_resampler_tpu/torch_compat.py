"""Drop-in ``torchaudio``-style resampling API (PyTorch compatibility).

The other large population of switchable resampler users lives on
``torchaudio.functional.resample`` / ``torchaudio.transforms.Resample``;
this shim offers their exact call surface over this package's engine so
migrating is an import change::

    # import torchaudio.functional as F
    from go_audio_resampler_tpu import torch_compat as F

    y = F.resample(waveform, 44100, 48000)          # torch in, torch out

    # transform style (plan built once, reused per call):
    resampler = F.Resample(orig_freq=44100, new_freq=48000)
    y = resampler(waveform)

Conventions follow torchaudio:

- ``waveform`` is a CPU ``torch.Tensor`` shaped ``[..., time]``; any
  number of leading dims (they are flattened into the engine's stream
  axis — one device program resamples every channel/batch element).
- The output has ``ceil(time * new_freq / orig_freq)`` frames
  (torchaudio's length convention; this package's canonical full-flush
  stream is trimmed/zero-padded to it) and the input's float dtype.
- ``orig_freq == new_freq`` returns the input unchanged.

Deviations (documented, by design):

- ``lowpass_filter_width``, ``rolloff``, ``resampling_method`` and
  ``beta`` parametrize torchaudio's windowed-sinc design; this engine
  always uses the soxr Kaiser designs, whose quality envelope exceeds
  every torchaudio setting (THD <= -130 dB vs ~-70 dB for torchaudio's
  default width-6 sinc).  The arguments are accepted and validated for
  signature compatibility but do not alter the filter; select the
  envelope with the extra ``quality=`` keyword (a
  :class:`~go_audio_resampler_tpu.api.QualityPreset`, default HIGH).
- Gradients do not flow through this shim (torch autograd cannot see
  the JAX program).  For differentiable resampling inside a JAX model
  use :func:`go_audio_resampler_tpu.resample` (exact adjoint); a torch
  training graph should keep torchaudio's native implementation.

Reference anchors: quality-string mapping resample.go:104-131; one-shot
semantics convenience.go:204-229.
"""

from __future__ import annotations

import math

import numpy as np

from .api import QualityPreset
from .convenience import preset_to_engine_quality
from .engine import plan_engine
from .engine.oneshot import oneshot as _engine_oneshot

__all__ = ["resample", "Resample"]

_METHODS = ("sinc_interp_hann", "sinc_interp_kaiser")


def _torch():
    try:
        import torch
    except ImportError as e:          # pragma: no cover - torch is baked in
        raise ImportError(
            "torch_compat requires PyTorch (pip install torch)") from e
    return torch


def _validate(orig_freq, new_freq, lowpass_filter_width, rolloff,
              resampling_method):
    if orig_freq <= 0 or new_freq <= 0:
        raise ValueError(
            f"frequencies must be positive, got {orig_freq} -> {new_freq}")
    if resampling_method not in _METHODS:
        raise ValueError(
            f"Invalid resampling method: {resampling_method}")
    if lowpass_filter_width <= 0:
        raise ValueError("Low pass filter width should be positive.")
    if not 0.0 < rolloff <= 1.0:
        raise ValueError("Rolloff value must be in the range (0, 1].")


def _run(x_np: np.ndarray, plan, n_out: int) -> np.ndarray:
    """Batched engine one-shot, trimmed/padded to torchaudio's length."""
    y = np.asarray(_engine_oneshot(plan, x_np, dtype=x_np.dtype))
    if y.shape[1] >= n_out:
        return y[:, :n_out]
    pad = np.zeros((y.shape[0], n_out - y.shape[1]), dtype=y.dtype)
    return np.concatenate([y, pad], axis=1)


def resample(waveform, orig_freq: float, new_freq: float,
             lowpass_filter_width: int = 6, rolloff: float = 0.9945,
             resampling_method: str = "sinc_interp_hann",
             beta: float | None = None, *,
             quality: QualityPreset = QualityPreset.HIGH):
    """torchaudio.functional.resample signature over this engine."""
    _validate(orig_freq, new_freq, lowpass_filter_width, rolloff,
              resampling_method)
    if float(orig_freq) == float(new_freq):
        torch = _torch()
        if not isinstance(waveform, torch.Tensor):
            raise TypeError(
                f"expected a torch.Tensor, got {type(waveform)!r}")
        return waveform
    plan = plan_engine(float(orig_freq), float(new_freq),
                       preset_to_engine_quality(quality))
    return _apply(waveform, plan, float(orig_freq), float(new_freq))


def _apply(waveform, plan, orig_freq: float, new_freq: float):
    """Run a prebuilt plan over a torch waveform ([..., time])."""
    torch = _torch()
    if not isinstance(waveform, torch.Tensor):
        raise TypeError(f"expected a torch.Tensor, got {type(waveform)!r}")
    if not waveform.is_floating_point():
        raise TypeError(
            f"expected a float waveform, got {waveform.dtype} "
            "(torchaudio's resample also requires floating point)")
    lead = waveform.shape[:-1]
    n = waveform.shape[-1]
    n_out = int(math.ceil(n * new_freq / orig_freq))
    if n == 0:
        return waveform.new_zeros(lead + (0,))
    x = waveform.detach().cpu()
    if x.dtype not in (torch.float32, torch.float64):
        # half / bfloat16 have no numpy counterpart torch will export;
        # compute at float32 (>= their precision), cast back on return.
        x = x.float()
    elif x.dtype == torch.float64:
        # Same warn-and-degrade contract as soxr_compat._compute_dtype:
        # without jax_enable_x64 a float64 array silently computes at
        # float32 inside the engine — degrade explicitly instead.
        from .soxr_compat import _compute_dtype
        if _compute_dtype(np.dtype(np.float64)) is np.float32:
            x = x.float()
    # torch CPU tensors share memory with numpy: the flatten/upload is the
    # only copy on the way in.
    x_np = x.contiguous().reshape(-1, n).numpy()
    y = np.ascontiguousarray(_run(x_np, plan, n_out))
    if not y.flags.writeable:
        y = y.copy()       # torch tensors must not alias read-only buffers
    out = torch.from_numpy(y).reshape(lead + (n_out,))
    return out.to(waveform.dtype)


class Resample:
    """torchaudio.transforms.Resample signature over this engine.

    Builds the conversion plan once at construction (the transform
    pattern: one instance reused across many calls); each call runs one
    batched device program over all leading dims.
    """

    def __init__(self, orig_freq: float = 16000, new_freq: float = 16000,
                 resampling_method: str = "sinc_interp_hann",
                 lowpass_filter_width: int = 6, rolloff: float = 0.9945,
                 beta: float | None = None, *, dtype=None,
                 quality: QualityPreset = QualityPreset.HIGH):
        _validate(orig_freq, new_freq, lowpass_filter_width, rolloff,
                  resampling_method)
        self.orig_freq = float(orig_freq)
        self.new_freq = float(new_freq)
        self.resampling_method = resampling_method
        self.lowpass_filter_width = lowpass_filter_width
        self.rolloff = rolloff
        self.beta = beta
        self.quality = quality
        self._dtype = dtype
        self._plan = None
        if self.orig_freq != self.new_freq:
            self._plan = plan_engine(self.orig_freq, self.new_freq,
                                     preset_to_engine_quality(quality))

    def __call__(self, waveform):
        torch = _torch()
        if not isinstance(waveform, torch.Tensor):
            raise TypeError(
                f"expected a torch.Tensor, got {type(waveform)!r}")
        if self._plan is None:
            return waveform
        y = _apply(waveform, self._plan, self.orig_freq, self.new_freq)
        if self._dtype is not None:
            y = y.to(self._dtype)
        return y

    def __repr__(self) -> str:
        return (f"{type(self).__name__}(orig_freq={self.orig_freq:.0f}, "
                f"new_freq={self.new_freq:.0f}, quality={self.quality.name})")
