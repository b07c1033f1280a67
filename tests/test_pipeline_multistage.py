"""Multi-stage pipeline-path behavior: half-band chains + residual stage.

Counterpart of the reference's flush_multistage_test.go:26 (issue #37
front-to-back tail propagation) and pipeline chunking behavior for ratios
that decompose into multiple stages.
"""

import numpy as np
import pytest

import go_audio_resampler_tpu as gar
from go_audio_resampler_tpu.pipeline import build_pipeline, QualityParams
from go_audio_resampler_tpu.utils import signals, metrics


def make(inr, outr, q=gar.QualityPreset.HIGH, ch=1):
    return gar.new_resampler(gar.Config(inr, outr, channels=ch,
                                        quality=gar.QualitySpec(preset=q)))


class TestMultiStagePipelines:
    @pytest.mark.parametrize("inr,outr,n_stages_min", [
        (48000, 8000, 3),    # ratio 1/6: 2 half-bands + residual
        (8000, 48000, 3),    # ratio 6: 2 half-bands + residual
        (44100, 11025, 2),   # ratio 1/4: exactly 2 half-bands
    ])
    def test_stage_count_and_length(self, inr, outr, n_stages_min):
        r = make(inr, outr)
        assert len(r.pipeline.stages) >= n_stages_min - 1
        x = signals.sine(8000, 500.0, inr)
        y = np.concatenate([r.process(x), r.flush()])
        expect = len(x) * outr / inr
        # Each stage adds its own flush tail; stay within a loose band
        assert abs(len(y) - expect) < 600
        assert np.all(np.isfinite(y))

    def test_flush_tail_propagation(self):
        # issue #37: stage tails must pass through downstream stages.  For
        # an input shorter than the chain's total latency, ALL output
        # arrives via the flush path; dropping tails would lose the signal
        # entirely.
        r = make(48000, 8000)
        x = signals.sine(2000, 500.0, 48000)
        head = r.process(x)
        tail = r.flush()
        y = np.concatenate([head, tail])
        assert len(tail) > 0
        assert len(y) == pytest.approx(2000 / 6, abs=30)
        # the tone (not just ramp noise) must be present in the flush
        assert np.abs(y).max() > 0.8

    def test_energy_preserved_long_signal(self):
        r = make(48000, 8000)
        x = signals.sine(48000, 500.0, 48000)  # 1 s
        y = np.concatenate([r.process(x), r.flush()])
        in_rms = np.sqrt(np.mean(x ** 2))
        mid = y[len(y) // 4: -len(y) // 4]
        out_rms = np.sqrt(np.mean(mid ** 2))
        assert out_rms == pytest.approx(in_rms, rel=0.02)

    def test_chunking_invariance_pipeline_path(self):
        r1 = make(48000, 8000)
        r2 = make(48000, 8000)
        x = signals.sine(6000, 800.0, 48000)
        a = np.concatenate([r1.process(x), r1.flush()])
        outs = [r2.process(x[i:i + 700]) for i in range(0, 6000, 700)]
        outs.append(r2.flush())
        b = np.concatenate(outs)
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)

    def test_tone_preserved_through_chain(self):
        r = make(48000, 8000)
        x = signals.sine(32768, 1000.0, 48000)
        y = np.concatenate([r.process(x), r.flush()])
        spec = np.abs(np.fft.rfft(y[500:500 + 4096] * np.hanning(4096)))
        peak_freq = np.argmax(spec) * 8000 / 4096
        assert abs(peak_freq - 1000.0) < 20

    def test_multichannel_multistage(self):
        r = make(48000, 8000, ch=3)
        chans = [signals.sine(4000, f, 48000) for f in (300.0, 600.0, 900.0)]
        outs = r.process_multi(chans)
        tails = r.flush_multi()
        full = [np.concatenate([o, t]) for o, t in zip(outs, tails)]
        assert len({len(f) for f in full}) == 1
        for f in full:
            assert np.all(np.isfinite(f))
