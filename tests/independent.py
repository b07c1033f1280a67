"""Independent-oracle comparison helpers.

This is the counterpart of the reference's live libsoxr A/B tier
(soxr_comparison_test.go:27-120): instead of a subprocess around real
libsoxr (unavailable here), the independent implementation is
``scipy.signal.resample_poly`` — a polyphase resampler that shares no code
or coefficients with this framework — plus closed-form tone least-squares
fits (ground truth with *no* reference implementation at all).

Methodology mirrors the reference:

- ``find_best_offset``: brute-force correlation-offset alignment
  (soxr_comparison_test.go:104-120, search +-600, skip 200, 1000-sample
  window), extended with a sub-sample FFT phase-slope refinement so the
  thresholds can be far tighter than the reference's 15-20%.
- ``align_and_compare``: Pearson correlation + max relative error over the
  aligned central region (the reference's correlationThreshold /
  maxErrorThreshold contract).
- ``tone_fit``: least-squares sin/cos/DC fit — amplitude must be ~1 and the
  residual (THD+noise of the whole chain) below a per-quality floor.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
from scipy.signal import firwin, lfilter, resample_poly


def pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = a - a.mean()
    b = b - b.mean()
    d = np.sqrt((a @ a) * (b @ b))
    return float(a @ b / d) if d > 0 else 0.0


def find_best_offset(got, want, search=600, skip=200, window=1000):
    """Reference findBestOffset: integer lag maximizing Pearson corr."""
    best, bo = -2.0, 0
    for off in range(-search, search + 1):
        sa, sb = skip, skip
        if off > 0:
            sa += off
        else:
            sb -= off
        if sa + window > len(got) or sb + window > len(want):
            continue
        c = pearson(got[sa:sa + window], want[sb:sb + window])
        if c > best:
            best, bo = c, off
    return bo, best


def subsample_align(ref, got):
    """Refine alignment by the cross-spectrum phase slope (fractional lag).

    Our output stream carries the filter group delay (generally a
    fractional number of output samples) while scipy's resample_poly is
    delay-compensated; an integer lag leaves a residual sub-sample shift
    that would dominate the error.  The shift is estimated by weighted LS
    on the cross-spectrum phase and applied to ``got`` via the FFT shift
    theorem.
    """
    n = min(len(ref), len(got))
    n -= n % 2
    a, b = ref[:n], got[:n]
    fa, fb = np.fft.rfft(a), np.fft.rfft(b)
    cross = fa * np.conj(fb)
    mag = np.abs(cross)
    k = np.arange(len(cross))
    sel = (mag > mag.max() * 1e-3) & (k > 0) & (k < 0.8 * len(cross))
    ph = np.angle(cross[sel])
    w = k[sel] * 2 * np.pi / n
    d = np.sum(ph * w * mag[sel]) / np.sum(w * w * mag[sel])
    wf = 2 * np.pi * np.arange(len(fb)) / n
    return a, np.fft.irfft(fb * np.exp(1j * wf * d), n), float(d)


def align_and_compare(want: np.ndarray, got: np.ndarray):
    """Full A/B: integer + sub-sample alignment, then Pearson and max error.

    Returns (pearson, max_rel_err) over the aligned central region.
    """
    off, _ = find_best_offset(got, want)
    if off > 0:
        g, r = got[off:], want
    else:
        g, r = got, want[-off:]
    k = min(len(g), len(r))
    g, r = g[:k], r[:k]
    s = slice(int(k * 0.15), int(k * 0.85))
    r2, g2, _ = subsample_align(r[s], g[s])
    cen = slice(len(r2) // 10, -(len(r2) // 10))
    err = float(np.abs(r2[cen] - g2[cen]).max() / np.abs(r2[cen]).max())
    return pearson(r2[cen], g2[cen]), err


def scipy_resample(x: np.ndarray, input_rate: float, output_rate: float):
    """Independent polyphase resample (scipy.signal.resample_poly)."""
    fr = Fraction(output_rate).limit_denominator(10**6) / \
        Fraction(input_rate).limit_denominator(10**6)
    return resample_poly(x, fr.numerator, fr.denominator)


def bandlimited_noise(n: int, cutoff_frac: float, seed: int = 11):
    """White noise lowpassed to ``cutoff_frac`` of Nyquist (401-tap FIR)."""
    rng = np.random.default_rng(seed)
    w = rng.standard_normal(n + 400)
    h = firwin(401, cutoff_frac)
    return lfilter(h, [1.0], w)[400:400 + n]


def tone_fit(y: np.ndarray, rate: float, freq: float, skip_frac=0.2):
    """LS-fit y ~ a*sin + b*cos + c over the steady-state region.

    Returns (amplitude, residual_db) where residual_db is the RMS of the
    unmodeled part relative to the fitted tone's RMS — the closed-form
    THD+N of the whole resampling chain.
    """
    n = len(y)
    s = slice(int(n * skip_frac), int(n * (1 - skip_frac)))
    t = np.arange(n)[s] / rate
    m = np.stack([np.sin(2 * np.pi * freq * t), np.cos(2 * np.pi * freq * t),
                  np.ones_like(t)], axis=1)
    coef, *_ = np.linalg.lstsq(m, y[s], rcond=None)
    amp = float(np.hypot(coef[0], coef[1]))
    resid = y[s] - m @ coef
    resid_db = 20 * np.log10(
        np.sqrt(np.mean(resid ** 2)) / (amp / np.sqrt(2)) + 1e-300)
    return amp, float(resid_db)
