"""Pallas fused-resampling kernel: interpret-mode correctness.

The compiled-mode path is exercised on real TPU hardware (bench.py and the
driver); here the kernel's logic is validated in the Pallas interpreter
against a dense-frames einsum reference.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from go_audio_resampler_tpu.engine import plan_engine
from go_audio_resampler_tpu.engine.oneshot import _fused_rational_matrix
from go_audio_resampler_tpu.ops import pallas_fused as pf
from go_audio_resampler_tpu.filterdesign import Quality


def reference(x, R, Ipx, nf):
    wx = R.shape[1]
    xp = np.pad(x, ((0, 0), (0, wx)))
    frames = np.stack([xp[:, m * Ipx:m * Ipx + wx] for m in range(nf)], axis=1)
    return np.einsum('sfw,pw->sfp', frames.astype(np.float64),
                     R).reshape(x.shape[0], nf * R.shape[0])


class TestFusedKernelInterpret:
    def test_cd_dat_matches_reference(self):
        plan = plan_engine(44100, 48000, Quality.HIGH)
        R, P2, Ipx, _lam = _fused_rational_matrix(plan)
        wx = R.shape[1]
        tf = pf.frame_tile_for(P2)
        n_tiles = 3
        n = n_tiles * tf * Ipx + (wx - Ipx)
        x = np.random.default_rng(0).normal(
            size=(pf.STREAM_TILE, n)).astype(np.float32)
        y = np.asarray(pf.fused_resample_pallas(
            jnp.asarray(x), jnp.asarray(R.T, dtype=jnp.float32),
            ipx=Ipx, wx=wx, p2=P2, interpret=True))
        x = x[:4]
        y = y[:4]
        y_ref = reference(x, R, Ipx, n_tiles * tf)
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(y, y_ref, atol=5e-6)

    def test_small_stream_tile_odd_period(self):
        # ts=8 path (odd p2 -> tf=128 -> small tile needed for VMEM):
        # synthetic banded matrix with p2=3, ipx=2.
        rng = np.random.default_rng(1)
        p2, ipx, wx = 3, 2, 7
        R = rng.normal(size=(p2, wx))
        tf = pf.frame_tile_for(p2)
        assert tf == 128
        n_tiles = 2
        n = n_tiles * tf * ipx + (wx - ipx)
        x = rng.normal(size=(8, n)).astype(np.float32)
        y = np.asarray(pf.fused_resample_pallas(
            jnp.asarray(x), jnp.asarray(R.T, dtype=jnp.float32),
            ipx=ipx, wx=wx, p2=p2, ts=8, interpret=True))
        y_ref = reference(x, R, ipx, n_tiles * tf)
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(y, y_ref, atol=5e-6)

    def test_frame_tile_alignment_rule(self):
        # tf*p2 must be 128-divisible (Mosaic block constraint)
        for p2 in (1, 2, 80, 147, 160, 256):
            tf = pf.frame_tile_for(p2)
            assert (tf * p2) % 128 == 0
            assert tf >= 1

    def test_stream_tile_requirement(self):
        plan = plan_engine(44100, 48000, Quality.HIGH)
        R, P2, Ipx, _lam = _fused_rational_matrix(plan)
        wx = R.shape[1]
        x = np.zeros((5, 4000), np.float32)  # 5 % STREAM_TILE != 0
        with pytest.raises(AssertionError):
            pf.fused_resample_pallas(jnp.asarray(x),
                                     jnp.asarray(R.T, dtype=jnp.float32),
                                     ipx=Ipx, wx=wx, p2=P2, interpret=True)

    def test_vmem_budget_gate(self):
        # Odd periods force tf=128, whose working set exceeds the scoped
        # VMEM limit at the default 64-row stream tile — the dispatcher
        # must shrink the tile (or fall back entirely).  (Found live:
        # default-on Pallas OOMed compiling 48k->44.1k, P2=147.)
        # Expectations pinned under the universal 2.4x Mosaic-overhead
        # safety factor (round 3: a superframed CD->DAT shape measured
        # 22.09 MB against a 14 MB explicit-scratch estimate).
        for ipx, wx, p2, ts_exp in [(294, 1100, 320, 16),   # CD->DAT super
                                    (256, 1155, 128, 32),   # decim x2
                                    (160, 351, 147, 8),     # 48k->44.1k
                                    (160, 1100, 147, 0)]:   # wide-wx odd
            tf = pf.frame_tile_for(p2)
            ts = pf.choose_stream_tile(ipx, wx, p2, tf, 1024)
            assert ts == ts_exp, (ipx, wx, p2, tf, ts)
            if ts:
                assert pf.vmem_bytes(ipx, wx, p2, tf, ts) <= pf.VMEM_BUDGET
        # batch smaller than the smallest tile -> XLA fallback
        assert pf.choose_stream_tile(294, 1100, 320, 16, 4) == 0


class TestStreamingBandedCoverage:
    """Streaming blocks shorter than the kernel's tile span (advisor r3).

    _banded_frames_apply must zero-pad [carry ++ block] up to the kernel's
    n_tiles*tf*ipx + (wx-ipx) coverage: the kernel floors its tile count
    from the input length, so an unpadded short block silently truncates
    the emitted stream (e.g. 44.1k->48k block 4096: 28 frames need 2
    tiles of 16, but carry+block covers only 1).  The Pallas branch is
    unreachable on CPU, so the gates are forced open and the kernel runs
    in interpret mode.
    """

    def _force_pallas(self, monkeypatch):
        import functools
        monkeypatch.setattr(pf, 'dispatch_for',
                    lambda m, tier=None: True)
        monkeypatch.setattr(pf, 'choose_stream_tile', lambda *a, **k: 8)
        monkeypatch.setattr(
            pf, 'fused_resample_pallas',
            functools.partial(pf.fused_resample_pallas.__wrapped__,
                              interpret=True))

    @pytest.mark.parametrize("rates,n_frames", [
        ((44100, 48000), 28),   # the advisor's truncation shape (tf=16)
        ((48000, 44100), 15),   # reverse direction, sub-tile block
    ])
    def test_short_block_padded_to_tile_span(self, monkeypatch, rates,
                                             n_frames):
        from go_audio_resampler_tpu.engine import streaming as strm

        plan = plan_engine(*rates, Quality.HIGH)
        R, P2, Ipx, _lam = _fused_rational_matrix(plan)
        wx = R.shape[1]
        tf = pf.frame_tile_for(P2)
        carry = -(-(wx - Ipx) // Ipx) * Ipx
        data_len = carry + n_frames * Ipx
        xlen = -(-n_frames // tf) * tf * Ipx + (wx - Ipx)
        assert data_len < xlen, "precondition: block under the tile span"
        rng = np.random.default_rng(5)
        data = jnp.asarray(rng.normal(size=(8, data_len)).astype(np.float32))
        rt = jnp.asarray(R.T, dtype=jnp.float32)
        y_xla = np.asarray(strm._banded_frames_apply(
            data, rt, Ipx, wx, P2, n_frames, 'xla'))
        self._force_pallas(monkeypatch)
        y_pl = np.asarray(strm._banded_frames_apply(
            data, rt, Ipx, wx, P2, n_frames, 'pallas'))
        assert y_pl.shape == y_xla.shape == (8, n_frames * P2)
        np.testing.assert_allclose(y_pl, y_xla, atol=1e-4)

    def test_min_frames_coverage_asserts(self):
        # An input too short for the requested frame count must fail at
        # trace time, not silently floor the tile count.
        plan = plan_engine(44100, 48000, Quality.HIGH)
        R, P2, Ipx, _lam = _fused_rational_matrix(plan)
        wx = R.shape[1]
        tf = pf.frame_tile_for(P2)
        x = np.zeros((8, tf * Ipx + (wx - Ipx)), np.float32)  # 1 tile
        with pytest.raises(AssertionError, match="frames"):
            pf.fused_resample_pallas(
                jnp.asarray(x), jnp.asarray(R.T, dtype=jnp.float32),
                ipx=Ipx, wx=wx, p2=P2, ts=8, min_frames=tf + 1,
                interpret=True)


class TestGeneralKernelInterpret:
    """Scalar-prefetch per-tile banded kernel (general/cubic one-shot)."""

    def test_matches_gather_einsum(self):
        rng = np.random.default_rng(2)
        n_tiles, tile, w_band = 5, 256, 300
        w_pad = -(-w_band // 128) * 128
        starts = np.sort(rng.integers(0, 500, size=n_tiles)).astype(np.int32)
        M = rng.normal(size=(n_tiles, tile, w_band))
        fetch = (-(-(w_pad + 128) // 128) * 128) + 128
        n = int(starts[-1]) + fetch
        x = rng.normal(size=(pf.STREAM_TILE, n)).astype(np.float32)
        m_t = np.zeros((n_tiles, w_pad, tile), dtype=np.float32)
        m_t[:, :w_band, :] = np.transpose(M, (0, 2, 1))
        y = np.asarray(pf.general_resample_pallas(
            jnp.asarray(x), jnp.asarray(m_t), jnp.asarray(starts),
            w_band=w_band, tile=tile, interpret=True))
        frames = np.stack([x[:4, s:s + w_band] for s in starts], axis=1)
        y_ref = np.einsum('stw,tpw->stp', frames.astype(np.float64),
                          M).reshape(4, n_tiles * tile)
        assert y.shape == (pf.STREAM_TILE, n_tiles * tile)
        # float32 accumulation over w_band=300 taps vs the f64 reference
        np.testing.assert_allclose(y[:4], y_ref, atol=2e-4)

    def test_oneshot_general_path_via_kernel(self, monkeypatch):
        # Force the dispatch gate open under the interpreter by checking
        # the helper directly against the XLA gather path output.
        import importlib
        osm = importlib.import_module('go_audio_resampler_tpu.engine.oneshot')
        plan = plan_engine(44100, 48001, Quality.HIGH)
        n = 4096
        count = plan.lengths.canonical(n)
        starts_np, M_np = osm._general_matrices(plan, count)
        rng = np.random.default_rng(3)
        u_len = int(np.max(starts_np)) + M_np.shape[2] + 8
        u = rng.normal(size=(8, u_len)).astype(np.float32)
        w_band = M_np.shape[2]
        w_pad = -(-w_band // 128) * 128
        m_t = np.zeros((M_np.shape[0], w_pad, M_np.shape[1]),
                       dtype=np.float32)
        m_t[:, :w_band, :] = np.transpose(M_np, (0, 2, 1)).astype(np.float32)
        fetch = (-(-(w_pad + 128) // 128) * 128) + 128
        xlen = int(starts_np[-1]) + fetch
        up = np.zeros((8, xlen), dtype=np.float32)
        up[:, :min(xlen, u_len)] = u[:, :min(xlen, u_len)]
        y = np.asarray(pf.general_resample_pallas(
            jnp.asarray(up), jnp.asarray(m_t),
            jnp.asarray(starts_np, dtype=jnp.int32),
            w_band=w_band, tile=M_np.shape[1], ts=8,
            interpret=True))[:, :count]
        frames = np.stack([up[:, s:s + w_band] for s in starts_np], axis=1)
        y_ref = np.einsum('stw,tpw->stp', frames.astype(np.float64),
                          M_np).reshape(8, -1)[:, :count]
        np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-4)

    def test_vmem_gate(self):
        # Oversized band width must refuse a stream tile.
        assert pf.choose_general_tile(1 << 20, 256, 64) == 0
        assert pf.choose_general_tile(512, 256, 64) == pf.STREAM_TILE
        assert pf.choose_general_tile(512, 256, 4) == 0  # batch too small
