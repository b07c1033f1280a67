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


class TestDispatchGate:
    """The gate is open at the MXU-native pass counts (HIGHEST, DEFAULT)
    and closed at the hand-rolled 3-pass tier, where the limb-split
    kernel loses the hardware A/B to XLA (see dispatch_allowed)."""

    def test_gate_per_tier(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.delenv("GAR_TPU_USE_PALLAS", raising=False)
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "highest")
        assert pf.dispatch_allowed()
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "high")
        assert not pf.dispatch_allowed()
        # DEFAULT = native 1-pass: the kernel wins 2x on hardware (68.5
        # vs 35.0 Gs/s interleaved depth slopes), so the gate is OPEN.
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "default")
        assert pf.dispatch_allowed()


class TestPerEngineDispatch:
    """EngineCore(dispatch=...) — per-instance lowering selection."""

    def test_invalid_mode_raises(self):
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        with pytest.raises(ValueError, match="dispatch"):
            EngineCore(plan, batch=1, dispatch="mosaic")

    def test_tune_resolves_and_streams(self):
        """dispatch='tune' resolves to a concrete mode (off-TPU: 'auto')
        and the stream equals the default engine's."""
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=2, block=2048, dtype=np.float32,
                         dispatch="tune")
        assert eng.dispatch in ("auto", "pallas", "xla")
        x = np.random.default_rng(4).normal(
            size=(2, 4096)).astype(np.float32)
        ref = EngineCore(plan, batch=2, block=2048, dtype=np.float32)
        got = np.concatenate([eng.process(x), eng.flush()], axis=1)
        want = np.concatenate([ref.process(x), ref.flush()], axis=1)
        np.testing.assert_allclose(got, want, rtol=0, atol=4e-6)

    @pytest.mark.parametrize("mode", ["auto", "pallas", "xla"])
    def test_modes_equal_output(self, mode):
        """All modes produce the same stream (on CPU every mode lowers to
        XLA; on TPU the gated parity test covers the kernel diff)."""
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        x = np.random.default_rng(9).normal(
            size=(2, 4096)).astype(np.float32)
        eng = EngineCore(plan, batch=2, block=2048, dtype=np.float32,
                         dispatch=mode)
        ref = EngineCore(plan, batch=2, block=2048, dtype=np.float32)
        got = np.concatenate([eng.process(x), eng.flush()], axis=1)
        want = np.concatenate([ref.process(x), ref.flush()], axis=1)
        np.testing.assert_array_equal(got, want)

    def test_dispatch_for_modes(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.delenv("GAR_TPU_USE_PALLAS", raising=False)
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "high")
        assert not pf.dispatch_for("xla")
        assert not pf.dispatch_for("auto")     # reduced tier closes auto
        assert pf.dispatch_for("pallas")       # explicit request stays open
        with pf.force_xla():
            assert not pf.dispatch_for("pallas")   # VJP trace overrides


class TestMxuDot:
    """The kernel-side tiered dot (hand-rolled bf16x3 for 'high')."""

    def _operands(self):
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(96, 32)).astype(np.float32))
        return a, b

    def test_highest_is_exact_f32(self, monkeypatch):
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "highest")
        a, b = self._operands()
        got = np.asarray(pf.mxu_dot(a, b))
        want = np.asarray(jnp.dot(a, b, precision=lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32))
        np.testing.assert_array_equal(got, want)

    def test_high_is_bf16x3_accurate(self, monkeypatch):
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "high")
        a, b = self._operands()
        got = np.asarray(pf.mxu_dot(a, b)).astype(np.float64)
        exact = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
        rel = np.abs(got - exact).max() / np.abs(exact).max()
        # hi+lo bf16 limbs carry ~16 mantissa bits; the dropped lo*lo term
        # and limb rounding bound the error near 2^-16 relative.
        assert 1e-9 < rel < 3e-5, rel

    def test_kernel_interpret_high_tier(self, monkeypatch):
        """fused_resample_pallas under the 3-pass tier (interpret mode)."""
        from go_audio_resampler_tpu.engine import plan_engine
        from go_audio_resampler_tpu.engine.oneshot import \
            _fused_rational_matrix
        from go_audio_resampler_tpu.filterdesign import Quality

        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "high")
        pf.fused_resample_pallas.clear_cache()
        plan = plan_engine(44100, 48000, Quality.HIGH)
        R, P2, Ipx, _lam = _fused_rational_matrix(plan)
        wx = R.shape[1]
        tf = pf.frame_tile_for(P2)
        n_tiles = 2
        n = n_tiles * tf * Ipx + (wx - Ipx)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(pf.STREAM_TILE, n)).astype(np.float32)
        try:
            y = np.asarray(pf.fused_resample_pallas(
                jnp.asarray(x), jnp.asarray(R.T, dtype=jnp.float32),
                ipx=Ipx, wx=wx, p2=P2, interpret=True))[:4]
        finally:
            pf.fused_resample_pallas.clear_cache()
        xp = np.pad(x[:4], ((0, 0), (0, wx)))
        frames = np.stack([xp[:, m * Ipx:m * Ipx + wx]
                           for m in range(n_tiles * tf)], axis=1)
        ref = np.einsum('sfw,pw->sfp', frames.astype(np.float64),
                        R).reshape(4, n_tiles * tf * P2)
        scale = np.abs(ref).max()
        assert np.abs(y - ref).max() / scale < 3e-4, \
            np.abs(y - ref).max() / scale


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


class TestTuneMethodology:
    """dispatch='tune' must measure DEVICE time: multi-step chained
    launches with a depth-slope contrast, not single-step round trips
    (round-3 VERDICT: one step is ~us of device work against a 25-35 ms
    heavy-tailed transport, so single-step minima measure the tunnel)."""

    def test_slope_pick_cancels_fixed_cost(self):
        """A variant with a huge fixed per-call cost but a small marginal
        (per-step) cost must win: the slope cancels the fixed part.  A
        single-step min-of-k would pick the other variant."""
        from go_audio_resampler_tpu.engine.streaming import _slope_pick

        clock = [0.0]

        def timer():
            return clock[0]

        def mk(fixed, per_step):
            def f(n):
                clock[0] += fixed + per_step * n
            return f

        fns = {"low_slope": mk(100.0, 0.001),   # slow call, fast kernel
               "low_fixed": mk(0.1, 1.0)}       # fast call, slow kernel
        assert _slope_pick(fns, (4, 36), timer=timer) == "low_slope"

    def test_slope_pick_uses_multi_step_launches(self):
        """Every variant is invoked at BOTH chain depths (> 1 step)."""
        from go_audio_resampler_tpu.engine.streaming import _slope_pick

        calls = {"a": [], "b": []}
        fns = {k: (lambda k: lambda n: calls[k].append(n))(k)
               for k in calls}
        _slope_pick(fns, (4, 36), iters=2)
        for k, seen in calls.items():
            assert set(seen) == {4, 36}, (k, seen)
            assert min(seen) > 1, "tune must chain steps, not time one"

    def test_tune_flow_runs_on_forced_backend(self, monkeypatch, tmp_path):
        """End-to-end tune flow (compile both variants as dynamic-depth
        chains, slope-measure) exercised on CPU by forcing the backend
        string; batch < 8 keeps the Pallas kernel out of reach so both
        'variants' lower to XLA and the flow is safe off-TPU.  Both
        variants run the SAME program here, so the contrast is pure
        noise: a measured winner OR the noise-refusal 'auto' are both
        legal outcomes — what must never happen is an error or a
        left-over 'tune' mode."""
        import jax as _jax
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        monkeypatch.setenv("GAR_TUNE_CACHE_FILE",
                           str(tmp_path / "tune.json"))
        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float32,
                         dispatch="tune")
        assert eng.dispatch in ("pallas", "xla", "auto")

    def test_slope_measure_reports_contrast_and_jitter(self):
        """Deterministic timer: contrast = gap of marginals, jitter = the
        per-cell min-settledness floor (two smallest samples' gap)."""
        from go_audio_resampler_tpu.engine.streaming import _slope_measure

        clock = [0.0]

        def timer():
            return clock[0]

        def mk(fixed, per_step):
            def f(n):
                clock[0] += fixed + per_step * n
            return f

        fns = {"fast": mk(1.0, 0.001), "slow": mk(1.0, 0.002)}
        winner, contrast, jitter = _slope_measure(fns, (4, 36), timer=timer)
        assert winner == "fast"
        assert contrast == pytest.approx(0.001 * 32)
        assert jitter == pytest.approx(0.0)     # noiseless timer


class TestPerEnginePrecisionPin:
    """Round-4: per-engine `precision=` pins the tier of the fused banded
    steps independently of the process-global env (and is part of the
    static jit key, so engines on different tiers coexist)."""

    def _trace(self, precision):
        from go_audio_resampler_tpu.engine.streaming import \
            _banded_frames_apply

        x = jnp.zeros((2, 40), jnp.float32)
        r_t = jnp.zeros((24, 8), jnp.float32)
        return str(jax.make_jaxpr(
            lambda d: _banded_frames_apply(d, r_t, 8, 24, 8, 3,
                                           'auto', precision))(x))

    def test_pin_overrides_env(self, monkeypatch):
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "default")
        j = self._trace("highest")
        assert "HIGHEST" in j
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "highest")
        j2 = self._trace("high")
        assert "HIGHEST" not in j2 and "HIGH" in j2

    def test_auto_follows_env(self, monkeypatch):
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "high")
        j = self._trace("auto")
        assert "HIGHEST" not in j and "HIGH" in j

    def test_tier_aware_dispatch_gate(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.delenv("GAR_TPU_USE_PALLAS", raising=False)
        monkeypatch.delenv("GAR_TPU_MATMUL_PRECISION", raising=False)
        assert pf.dispatch_for("auto", "default")     # kernel wins 2x
        assert not pf.dispatch_for("auto", "high")    # limb split loses
        assert pf.dispatch_for("auto", "highest")
        # env says high (gate closed globally), per-engine pin reopens:
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "high")
        assert not pf.dispatch_for("auto", None)
        assert pf.dispatch_for("auto", "highest")

    def test_engine_ctor_validates_and_stores(self):
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=1, precision="highest")
        assert eng.precision == "highest"
        with pytest.raises(ValueError, match="precision"):
            EngineCore(plan, batch=1, precision="bf16")

    def test_engines_with_different_pins_match_on_cpu(self):
        # Tier is numerically a no-op on CPU f64: two engines with
        # different pins must emit identical streams (plumbing check —
        # the pin changes only the matmul pass count on TPU).
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        x = np.random.default_rng(73).standard_normal((1, 5000)) * 0.5
        outs = {}
        for pin in ("highest", "default"):
            eng = EngineCore(plan, batch=1, block=512, dtype=np.float64,
                             precision=pin)
            outs[pin] = np.concatenate([eng.process(x), eng.flush()],
                                       axis=1)
        np.testing.assert_array_equal(outs["highest"], outs["default"])

    def _general_engine_jaxpr(self, precision):
        """Jaxpr of the general (non-exact) two-stage walk's step with a
        per-engine pin — round-5: the pin now covers the non-banded
        topologies (prestage conv + poly emit), not just the fused
        banded steps."""
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        plan = plan_engine(44100.0, 48001.0, Quality.HIGH)
        assert plan.kind == 'two_stage' and not plan.is_rational_exact
        eng = EngineCore(plan, batch=2, block=256, dtype=np.float32,
                         precision=precision)
        core = eng.core_fn()
        st0 = eng._init_state()
        x = jnp.zeros((2, eng.block), jnp.float32)
        return str(jax.make_jaxpr(core)(st0, x))

    def test_general_walk_pin_overrides_env(self, monkeypatch):
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "default")
        j = self._general_engine_jaxpr("highest")
        assert "HIGHEST" in j
        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "highest")
        j2 = self._general_engine_jaxpr("default")
        assert "HIGHEST" not in j2

    def test_dft_up_pin_overrides_env(self, monkeypatch):
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        monkeypatch.setenv("GAR_TPU_MATMUL_PRECISION", "default")
        plan = plan_engine(24000.0, 48000.0, Quality.HIGH)
        assert plan.kind == 'dft_up'
        eng = EngineCore(plan, batch=2, block=256, dtype=np.float32,
                         precision="highest")
        core = eng.core_fn()
        j = str(jax.make_jaxpr(core)(eng._init_state(),
                                     jnp.zeros((2, eng.block), jnp.float32)))
        assert "HIGHEST" in j

    def test_general_engines_with_different_pins_match_on_cpu(self):
        # Plumbing check on the general topology: the pin must not alter
        # values off-TPU (f64 path ignores the tier numerically).
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        plan = plan_engine(44100.0, 48001.0, Quality.HIGH)
        x = np.random.default_rng(74).standard_normal((1, 4000)) * 0.5
        outs = {}
        for pin in ("highest", "default"):
            eng = EngineCore(plan, batch=1, block=512, dtype=np.float64,
                             precision=pin)
            outs[pin] = np.concatenate([eng.process(x), eng.flush()],
                                       axis=1)
        np.testing.assert_array_equal(outs["highest"], outs["default"])

    def test_config_plumbs_precision(self):
        import go_audio_resampler_tpu as gar

        r = gar.new_resampler(gar.Config(
            44100, 48000,
            quality=gar.QualitySpec(preset=gar.QualityPreset.HIGH),
            dtype=np.float64, precision="highest"))
        assert all(getattr(e, "precision", "highest") == "highest"
                   for e in r._exec)
        with pytest.raises(gar.InvalidConfigError, match="precision"):
            gar.Config(44100, 48000, precision="fast").validate()


class TestTunePersistence:
    """dispatch='tune' winners persist per (plan, shape, tier, device):
    a deployment tunes once; later engines pin the stored winner with no
    extra compile (ROADMAP 11)."""

    def test_cache_roundtrip(self, tmp_path, monkeypatch):
        from go_audio_resampler_tpu.engine import streaming as strm

        monkeypatch.setenv("GAR_TUNE_CACHE_FILE",
                           str(tmp_path / "tune.json"))
        assert strm._tune_cache_get("k") is None
        strm._tune_cache_put("k", "pallas")
        assert strm._tune_cache_get("k") == "pallas"
        strm._tune_cache_put("k2", "xla")
        assert strm._tune_cache_get("k") == "pallas"
        assert strm._tune_cache_get("k2") == "xla"

    def test_cache_disabled_by_empty_env(self, monkeypatch):
        from go_audio_resampler_tpu.engine import streaming as strm

        monkeypatch.setenv("GAR_TUNE_CACHE_FILE", "")
        strm._tune_cache_put("k", "pallas")     # no-op, no crash
        assert strm._tune_cache_get("k") is None

    def test_seeded_cache_skips_measurement(self, tmp_path, monkeypatch):
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.engine import streaming as strm
        from go_audio_resampler_tpu.filterdesign import Quality

        monkeypatch.setenv("GAR_TUNE_CACHE_FILE",
                           str(tmp_path / "tune.json"))
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        probe = EngineCore(plan, batch=2, block=2048, dtype=np.float32)
        strm._tune_cache_put(probe._tune_key(), "xla")
        # Fake a TPU backend so tune does not early-return 'auto'; the
        # cache hit must answer BEFORE any variant compiles (a compile
        # attempt with the fake backend would fail loudly).
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        eng = EngineCore(plan, batch=2, block=2048, dtype=np.float32,
                         dispatch="tune")
        assert eng.dispatch == "xla"

    def test_key_separates_shapes_and_tiers(self):
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        a = EngineCore(plan, batch=2, block=2048, dtype=np.float32)
        b = EngineCore(plan, batch=2, block=2048, dtype=np.float32)
        c = EngineCore(plan, batch=2, block=4096, dtype=np.float32)
        d = EngineCore(plan, batch=2, block=2048, dtype=np.float32,
                       precision="default")
        assert a._tune_key() == b._tune_key()
        assert a._tune_key() != c._tune_key()
        assert a._tune_key() != d._tune_key()

    def test_key_carries_version_tokens(self):
        """A pinned winner must not survive kernel rewrites or JAX
        upgrades that could flip the measured ordering: the cache key
        folds in both version strings (round-4 advisor finding)."""
        import jax as _jax
        import go_audio_resampler_tpu as gar
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.filterdesign import Quality

        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=2, block=2048, dtype=np.float32)
        key = eng._tune_key()
        assert gar.__version__ in key
        assert _jax.__version__ in key


class TestTuneNoiseRefusal:
    """Round-5: dispatch='tune' refuses to persist noise — when the
    marginal-time contrast is below TUNE_NOISE_FACTOR x the jitter
    floor, the engine pins 'auto' and writes nothing (round-4 verdict
    item 5: never freeze a coin flip into the machine-wide cache)."""

    def _tune_with_fake_measure(self, monkeypatch, tmp_path, contrast,
                                jitter):
        import jax as _jax
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.engine import streaming as strm
        from go_audio_resampler_tpu.filterdesign import Quality

        cache = tmp_path / "tune.json"
        monkeypatch.setenv("GAR_TUNE_CACHE_FILE", str(cache))
        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            strm, "_slope_measure",
            lambda fns, depths, iters=5, timer=None:
                ("pallas", contrast, jitter))
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        eng = EngineCore(plan, batch=1, block=512, dtype=np.float32,
                         dispatch="tune")
        return eng, cache

    def test_low_contrast_falls_back_and_does_not_write(self, monkeypatch,
                                                        tmp_path):
        eng, cache = self._tune_with_fake_measure(
            monkeypatch, tmp_path, contrast=1e-6, jitter=1e-3)
        assert eng.dispatch == "auto"
        assert not cache.exists(), "low-contrast tune must persist nothing"

    def test_high_contrast_pins_and_records_margin(self, monkeypatch,
                                                   tmp_path):
        import json

        eng, cache = self._tune_with_fake_measure(
            monkeypatch, tmp_path, contrast=1e-2, jitter=1e-4)
        assert eng.dispatch == "pallas"
        entry = list(json.loads(cache.read_text()).values())[0]
        assert entry["winner"] == "pallas"
        assert entry["contrast_s"] == pytest.approx(1e-2)
        assert entry["jitter_s"] == pytest.approx(1e-4)

    def test_dict_cache_entry_resolves_winner(self, monkeypatch, tmp_path):
        """A later engine reads the dict-form entry's winner (and a
        legacy bare-string entry still resolves)."""
        import jax as _jax
        from go_audio_resampler_tpu.engine import EngineCore, plan_engine
        from go_audio_resampler_tpu.engine import streaming as strm
        from go_audio_resampler_tpu.filterdesign import Quality

        monkeypatch.setenv("GAR_TUNE_CACHE_FILE",
                           str(tmp_path / "tune.json"))
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        probe = EngineCore(plan, batch=2, block=2048, dtype=np.float32)
        strm._tune_cache_put(probe._tune_key(),
                             {"winner": "xla", "contrast_s": 1e-2,
                              "jitter_s": 1e-4})
        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        eng = EngineCore(plan, batch=2, block=2048, dtype=np.float32,
                         dispatch="tune")
        assert eng.dispatch == "xla"
