"""Roofline / MFU accounting (utils/roofline.py).

The model must reproduce the hand analysis that shaped the kernels:
CD->DAT HIGH's fused matrix is [160, 343] over Ipx=147 (ROADMAP 15,
pallas_fused.py "~15 Tf/s effective at HIGHEST"), so a measured 20.8
Gs/s must come out as ~15.5 Tflop/s and ~47% of the 6-pass v5e peak.
"""

import os

import numpy as np
import pytest

from go_audio_resampler_tpu.utils.roofline import (
    TIER_PASSES, analyze, banded_model, device_peaks)

V5E = {"kind": "TPU v5 lite", "bf16_tflops": 197.0, "hbm_gbps": 819.0}


class TestBandedModel:
    def test_cd_dat_dims(self):
        # The flagship serving step: R [160, 343], Ipx = 147.
        m = banded_model(160, 343, 147)
        assert m["flops_per_in"] == pytest.approx(2 * 160 * 343 / 147)
        # MXU slots: lanes 160 -> 256, K 343 -> 384.
        assert m["slots_per_in"] == pytest.approx(2 * 256 * 384 / 147)
        assert m["useful_frac_of_slots"] == pytest.approx(
            (160 * 343) / (256 * 384))
        # Pallas traffic: ~1.08 reads of x + P2/Ipx output samples, f32.
        assert m["bytes_per_in"] == pytest.approx(4 * (1.08 + 160 / 147))

    def test_matches_live_plan(self):
        from go_audio_resampler_tpu.engine import plan_engine
        from go_audio_resampler_tpu.engine.oneshot import (
            _fused_rational_matrix, superframe)
        from go_audio_resampler_tpu.filterdesign import Quality

        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        r, p2, ipx, _lam = _fused_rational_matrix(plan)
        rs, ipxs = superframe(r, ipx)
        m = banded_model(rs.shape[0], rs.shape[1], ipxs,
                         nnz=int(np.count_nonzero(rs)))
        assert (m["p2"], m["wx"], m["ipx"]) == (160, 343, 147.0)
        # The matrix is ~57% dense; the nnz accounting must sit below
        # the dense flops.
        assert m["nnz_flops_per_in"] < m["flops_per_in"]
        assert m["nnz_flops_per_in"] / m["flops_per_in"] == pytest.approx(
            0.57, abs=0.02)

    def test_fractional_ipx(self):
        m = banded_model(256, 512, 256 * 44100 / 48001)
        assert m["flops_per_in"] == pytest.approx(
            2 * 256 * 512 / (256 * 44100 / 48001))


class TestAnalyze:
    def test_headline_numbers(self):
        # 20.8 Gs/s on the [160,343]/147 step at HIGHEST (6-pass):
        # ~15.5 Tflop/s useful, ~47% of 197/6, ~85% of the slot ceiling.
        m = banded_model(160, 343, 147)
        a = analyze(20767.0, m, tier="highest", peaks=V5E)
        assert a["tflops_achieved"] == pytest.approx(15.5, abs=0.1)
        assert a["eff_peak_tflops"] == pytest.approx(197.0 / 6, abs=0.1)
        assert a["mfu_pct"] == pytest.approx(47.2, abs=1.0)
        assert a["mfu_slot_pct"] == pytest.approx(84.6, abs=1.5)
        # Issued slots near the roof but useful fraction only ~56%:
        # the verdict names the tile padding, not kernel engineering.
        assert a["bound"] == "mxu(tile-padding)"

    def test_hbm_bound_case(self):
        # The 1-pass bf16 ingest tier: 72.4 Gs/s -> ~630 GB/s of 819,
        # while the single-pass MXU peak (197) is far away.
        m = banded_model(160, 343, 147)
        a = analyze(72428.0, m, tier="default", peaks=V5E)
        assert a["hbm_pct"] > 60.0
        assert a["bound"] == "hbm"

    def test_framing_bound_case(self):
        m = banded_model(160, 343, 147)
        a = analyze(1000.0, m, tier="highest", peaks=V5E)
        assert a["bound"] == "framing"

    def test_mxu_bound_clean_shape(self):
        # A shape with no padding waste at the slot roof reads 'mxu'.
        m = banded_model(256, 512, 256)
        a = analyze(22000.0, m, tier="highest", peaks=V5E)
        assert m["useful_frac_of_slots"] == 1.0
        assert a["mfu_pct"] == a["mfu_slot_pct"]
        assert a["bound"] == "mxu"

    def test_tier_scaling(self):
        m = banded_model(160, 343, 147)
        hi = analyze(10000.0, m, tier="highest", peaks=V5E)
        de = analyze(10000.0, m, tier="default", peaks=V5E)
        # Rounded to one decimal in the artifact, hence the tolerance.
        assert hi["mfu_pct"] == pytest.approx(
            de["mfu_pct"] * TIER_PASSES["highest"], abs=0.4)


class TestDevicePeaks:
    def test_known_kind_fallback_and_override(self, monkeypatch):
        p = device_peaks(device=None)
        assert p["bf16_tflops"] > 0 and p["hbm_gbps"] > 0
        monkeypatch.setenv("GAR_TPU_PEAK_BF16_TFLOPS", "500")
        monkeypatch.setenv("GAR_TPU_HBM_GBPS", "1000")
        p2 = device_peaks(device=None)
        assert p2["bf16_tflops"] == 500.0 and p2["hbm_gbps"] == 1000.0

    def test_explicit_device_kind(self):
        class Fake:
            device_kind = "TPU v4"

        p = device_peaks(device=Fake())
        assert p["kind"] == "TPU v4"
        assert p["bf16_tflops"] == 275.0
