"""Matmul precision tier (GAR_TPU_MATMUL_PRECISION) plumbing tests.

The TPU MXU executes a float32 matmul as bf16 passes (DEFAULT=1, HIGH=3,
HIGHEST=6); ``ops.pallas_fused.dot_precision`` routes every banded/framing
hot-path dot through one env-selected tier (default ``highest`` = exact-f32
reference-parity numerics).  These tests pin the tier map, verify the
requested tier reaches the traced dot_general, and that the default tier's
numerics are byte-stable on the CPU suite (where precision is a no-op).

Like GAR_TPU_USE_PALLAS, the env var is read at TRACE time: toggling it in
a live process requires clearing jit caches (bench.py does the same dance
for the Pallas A/B).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from go_audio_resampler_tpu.ops import pallas_fused as pf


class TestTierMap:
    def test_default_is_highest(self, monkeypatch):
        monkeypatch.delenv("GAR_TPU_MATMUL_PRECISION", raising=False)
        assert pf.dot_precision() == lax.Precision.HIGHEST

    @pytest.mark.parametrize("name,want", [
        ("default", lax.Precision.DEFAULT),
        ("high", lax.Precision.HIGH),
        ("highest", lax.Precision.HIGHEST),
        ("HIGH", lax.Precision.HIGH),       # case-insensitive
    ])
    def test_env_selects_tier(self, monkeypatch, name, want):
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", name)
        assert pf.dot_precision() == want

    def test_unknown_tier_raises(self, monkeypatch):
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "bf16")
        with pytest.raises(KeyError):
            pf.dot_precision()


class TestTierReachesTrace:
    """The env tier must appear in the traced dot_general of the hot paths."""

    def _trace_streaming_step(self):
        from go_audio_resampler_tpu.engine.streaming import \
            _banded_frames_apply

        x = jnp.zeros((2, 40), jnp.float32)
        r_t = jnp.zeros((24, 8), jnp.float32)
        return str(jax.make_jaxpr(
            lambda d: _banded_frames_apply(d, r_t, 8, 24, 8, 3))(x))

    def test_high_vs_highest_differ_in_trace(self, monkeypatch):
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "highest")
        j_highest = self._trace_streaming_step()
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "high")
        j_high = self._trace_streaming_step()
        assert "HIGHEST" in j_highest
        assert "HIGHEST" not in j_high and "HIGH" in j_high


class TestCpuNumericsUnchanged:
    """On CPU the precision attr is advisory: tiers must not change output
    (guards against the knob accidentally altering shapes/semantics)."""

    def test_oneshot_tier_invariant_cpu(self, monkeypatch):
        import importlib

        from go_audio_resampler_tpu.engine import plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality
        osm = importlib.import_module('go_audio_resampler_tpu.engine.oneshot')

        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        x = jnp.asarray(np.random.default_rng(3).normal(
            size=(2, 4000)).astype(np.float32))
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "highest")
        osm._oneshot_jit.clear_cache()
        y_hi = np.asarray(osm.oneshot(plan, x, dtype=np.float32))
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "high")
        osm._oneshot_jit.clear_cache()
        try:
            y_3p = np.asarray(osm.oneshot(plan, x, dtype=np.float32))
        finally:
            osm._oneshot_jit.clear_cache()
        assert y_hi.shape == y_3p.shape
        np.testing.assert_array_equal(y_hi, y_3p)
