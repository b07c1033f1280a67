"""Benchmark: Msamples/sec/chip, 44.1k->48k QualityHigh batched streams (f32).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.  Baseline = the BASELINE.json north star of
1000 Msamples/sec/chip (1 Gsample/s input throughput).

Methodology (see benchmarks/README.md): the serving-path streaming step —
the fused periodic matmul that converts 44.1 kHz blocks to 48 kHz
(engine/streaming._step_rational_fused) — is chained N blocks deep
on-device with a dynamic-trip-count ``lax.fori_loop``, so ONE compiled
program yields the slope between two chain depths (marginal samples /
marginal time).  The depth slope cancels the harness's fixed ~25-30 ms
host<->device round trip exactly like the old two-batch slope, but needs
ONE compile per dispatch variant instead of two; each timing is a minimum
over interleaved synchronized runs (robust to the tunnel's heavy-tailed
jitter).

Time budget (round-3 lesson: BENCH_r03 timed out with nothing printed):
the run is hard-capped at ``GAR_BENCH_BUDGET_S`` seconds (default 1200 —
healthy sessions finish all three phases in 30-130 s; the slack exists
because the dev tunnel occasionally stalls a single native call for
5-15 minutes, and a longer budget turns such an episode into a late
result instead of a zero).
The XLA variant — no Pallas compile risk — is compiled and measured
first and its headline is held as the result-so-far; the Pallas variant
is attempted only if budget remains, and an interleaved A/B re-measure
picks the session winner.  SIGTERM/SIGALRM print the best-so-far JSON
and exit 0, so a driver timeout or a hung compile can no longer produce
an empty artifact.  Compiled programs are cached on disk
(``.jax_cache``) so repeat sessions skip the 2-10 min tunnel compiles.

Dispatch: the step has two lowerings — the Pallas DMA-framing kernel and
the XLA gather+einsum — whose ordering flips between tunnel sessions
(interleaved A/Bs have measured Pallas +13% and XLA +31% on different
days, same v5e).  A serving operator pins whichever wins on their
machine (per-engine ``dispatch=``), so the headline reports the session
winner; both slopes are recorded in the JSON line when both ran.

A third, informational phase measures the 1-pass bf16 ingest tier
(``slope_ingest_tier``, ~72 Gs/s measured; THD −70.6 dB pinned in
QUALITY_tpu.json) when budget remains — it never alters the headline,
which stays at full quality parity.  Two further informational phases
track the other flagship paths so per-round regressions on them are
driver-visible (round-4 verdict item 8): ``slope_ml_ingest`` (the
integer-decimation step of the 256-stream 48k->16k BASELINE config)
and ``slope_general`` (the non-exact-ratio 44.1k->48,001 streaming
walk).

Every slope carries roofline fields (``roofline*``: tflops_achieved,
mfu_pct, mfu_slot_pct, hbm_gbps, bound) computed from the step's
static matrix dims — see utils/roofline.py.  flops/sample is a
compile-time constant, so the accounting costs nothing at run time.

Quality parity lives in the hardware artifact (QUALITY_tpu.json / ``make
quality-tpu``), not here — bench compiles exactly the programs it times.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

BUDGET_S = float(os.environ.get("GAR_BENCH_BUDGET_S", "1200"))
_T0 = time.monotonic()

# Result-so-far: updated in place as phases finish; emitted exactly once.
_RESULT = {
    "metric": ("Msamples/sec/chip 44.1k->48k QualityHigh batched-streams "
               "fused step f32 (depth slope 8->264 blocks, best "
               "dispatch/layout)"),
    "value": 0.0,
    "unit": "Msamples/s",
    "vs_baseline": 0.0,
    "status": "init",
}
_EMITTED = False


def _elapsed() -> float:
    return time.monotonic() - _T0


def _remaining() -> float:
    return BUDGET_S - _elapsed()


def _emit(final: bool = False) -> None:
    """Print the best-so-far JSON line exactly once and flush."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    _RESULT["elapsed_s"] = round(_elapsed(), 1)
    _RESULT["budget_s"] = BUDGET_S
    print(json.dumps(_RESULT), flush=True)


def _bail(why: str):
    if _RESULT["status"] == "init" or _RESULT["value"] == 0.0:
        _RESULT["status"] = f"interrupted({why}) before first slope"
        _emit()
        # Match the __main__ convention: a budget-expired run with zero
        # results must not report success (round-4 advisor finding).
        os._exit(1)
    _RESULT["status"] = f"partial({why})"
    _emit()
    os._exit(0)


def _on_signal(signum, frame):
    _bail(f"sig{signum}")


# Best-effort: catches a driver SIGTERM while the main thread runs Python.
signal.signal(signal.SIGTERM, _on_signal)


def _watchdog():
    """Hard internal deadline that survives native-blocked main threads.

    Python signal handlers are deferred while the main thread sits inside
    a PJRT compile/execute call (they run only at bytecode boundaries),
    so a hung tunnel compile would eat a SIGALRM — round 3's failure
    mode.  A daemon thread is not blocked by the main thread's native
    call: it emits the best-so-far JSON at the budget and exits 0,
    guaranteeing the driver always captures a parsed line as long as the
    default budget stays under the driver's own timeout."""
    deadline = _T0 + BUDGET_S
    while True:
        now = time.monotonic()
        if now >= deadline:
            _bail("budget")
        time.sleep(min(1.0, deadline - now))


threading.Thread(target=_watchdog, daemon=True).start()


def _backend_with_retry() -> str:
    """Resolve the JAX backend, retrying transient tunnel outages.

    The axon TPU tunnel occasionally refuses initialization (UNAVAILABLE)
    for minutes at a time; a failed init is cached on the backend
    registry, so each retry clears it first.  Total wait is capped by the
    run budget: retries stop once less than half the budget remains.
    """
    import jax

    last = None
    attempt = 0
    while True:
        try:
            return jax.default_backend()
        except RuntimeError as e:          # backend init failure
            last = e
            try:
                import jax._src.xla_bridge as _xb
                _xb._clear_backends()
            except Exception:
                pass
            attempt += 1
            if attempt >= 3 or _remaining() < BUDGET_S * 0.5:
                raise last
            time.sleep(min(45.0, max(_remaining() - 30.0, 1.0)))


def _min_times(fns: dict, warmups: int = 1, iters: int = 12) -> dict:
    """Minimum synchronized wall time per function, INTERLEAVED.

    On the axon platform block_until_ready does not synchronize with
    device completion; a scalar device_get does.  Interleaving the
    variants inside each iteration makes tunnel drift hit all of them
    equally, so the cross-variant contrast is trustworthy even when
    absolute throughput wanders between sessions.  Stops early when the
    budget runs low (the minimum over fewer iterations is still valid,
    just noisier).
    """
    times = {k: [] for k in fns}

    def mins():
        return {k: float(np.min(v)) if v else float("inf")
                for k, v in times.items()}

    # Warmup timings count toward the min too: a degraded-tunnel session
    # can spend 30+ s per round trip, and ONE full pass must suffice for
    # a (noisy but real) slope when the budget dies early.
    for it in range(warmups + iters):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            float(fn())
            times[k].append(time.perf_counter() - t0)
            if _remaining() < 10.0:
                return mins()
        if it >= warmups + 2 and _remaining() < 20.0:
            break
    return mins()


def main() -> None:
    # Persistent compilation cache: tunnel compiles take 2-10 min; repeat
    # sessions (or a bench run after the quality tier) hit the disk cache.
    try:
        import jax
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    import jax
    import jax.numpy as jnp
    from jax import lax
    from go_audio_resampler_tpu.engine import plan_engine
    from go_audio_resampler_tpu.engine.oneshot import _fused_rational_matrix
    from go_audio_resampler_tpu.engine.streaming import _step_rational_fused
    from go_audio_resampler_tpu.filterdesign import Quality
    from go_audio_resampler_tpu.utils.roofline import (analyze, banded_model,
                                                       device_peaks)

    try:
        backend = _backend_with_retry()
    except RuntimeError as e:
        _RESULT["status"] = f"backend init failed: {type(e).__name__}"
        _emit()
        return
    on_tpu = backend not in ("cpu",)
    _RESULT["backend"] = backend

    plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
    r, p2, ipx, _lam = _fused_rational_matrix(plan)
    rt = jnp.asarray(r.T, dtype=jnp.float32)
    wx = r.shape[1]
    blk = 16 * ipx                       # 2352 input samples per block
    carry_len = -(-max(wx - ipx, 0) // ipx) * ipx
    s = 1024 if on_tpu else 8
    n_lo, n_hi = (8, 264) if on_tpu else (2, 6)
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(s, blk)).astype(np.float32) * 0.5
    d_samples = (n_hi - n_lo) * s * blk
    baseline = 1000.0  # Msamples/sec/chip north star

    # Roofline accounting: flops/sample is static per plan (the banded
    # matrix dims), so every slope can say which resource binds it.
    def _tmajor_read_amp(p2_, wx_, ipx_, s_):
        """reads of x per input sample for the time-major kernel's
        actual (ts, kf) at this geometry (one fetch slab per kf
        frames)."""
        from go_audio_resampler_tpu.ops import pallas_fused as pf
        wx_pad = -(-wx_ // 128) * 128
        ts = pf.choose_tmajor_tile(wx_pad, p2_, s_) or 128
        kf = pf.choose_tmajor_kf(wx_pad, p2_, ts, ipx_, blk // ipx_)
        fetch = -(-((kf - 1) * ipx_ + wx_pad + 8) // 8) * 8
        return fetch / (kf * ipx_)

    peaks = device_peaks()
    headline_tier = os.environ.get("GAR_TPU_MATMUL_PRECISION",
                                   "highest").lower()
    model_by_dispatch = {
        # Pallas DMA framing re-reads only the inter-tile overlap;
        # XLA materializes overlapping frames (wx/ipx reads of x).
        "pallas": banded_model(p2, wx, ipx),
        "xla": banded_model(p2, wx, ipx, read_amp=wx / ipx),
        # Time-major layout (engine/tmajor.py): P2 on the 8-granular
        # sublane axis (no 160->256 lane padding); each grid step DMAs
        # one slab of (kf-1)*ipx + wx_pad + 8 rows shared by kf frames
        # (ops/pallas_fused.choose_tmajor_kf), so reads of x per input
        # sample = fetch / (kf*ipx).
        "tmajor": banded_model(p2, wx, ipx,
                               read_amp=_tmajor_read_amp(p2, wx, ipx, s),
                               p2_granule=8),
    }

    def _roofline(val: float, dispatch: str, tier: str) -> dict:
        return analyze(val, model_by_dispatch[dispatch], tier=tier,
                       peaks=peaks)

    def make(dispatch: str):
        """One compiled program per dispatch: dynamic-depth block chain.

        ``n`` is a traced trip count (fori_loop -> while_loop), so the
        depth slope needs only this single compile.  The same input block
        is re-fed every iteration; the carry still evolves, so no
        iteration can be folded away, and jnp.sum(y) keeps the whole
        matmul live.
        """
        @jax.jit
        def f(n, x, rt_):
            def body(_, val):
                c, acc = val
                c2, y, _n = _step_rational_fused(rt_, c, x, ipx=ipx, wx=wx,
                                                 p2=p2, dispatch=dispatch)
                return (c2, acc + jnp.sum(y))
            init = (jnp.zeros((s, carry_len), jnp.float32), jnp.float32(0))
            _, acc = lax.fori_loop(0, n, body, init)
            return acc

        x = jnp.asarray(x_np)
        return {
            n_lo: lambda: f(n_lo, x, rt),
            n_hi: lambda: f(n_hi, x, rt),
        }

    def slope(mins: dict, v: str) -> float:
        lo, hi = mins[(v, n_lo)], mins[(v, n_hi)]
        if not (np.isfinite(lo) and np.isfinite(hi)):
            return 0.0                   # a depth never ran: no slope
        d_t = max(hi - lo, 1e-9)
        return d_samples / d_t / 1e6

    # Phase 1: XLA variant (no Pallas compile risk) -> first valid headline.
    fns = {}
    xla_fns = make("xla")
    fns[("xla", n_lo)] = xla_fns[n_lo]
    fns[("xla", n_hi)] = xla_fns[n_hi]
    t_c0 = time.monotonic()
    float(fns[("xla", n_hi)]())           # compile (one program, both depths)
    compile_s = time.monotonic() - t_c0
    def publish_xla(s, status):
        if s > 0:
            _RESULT.update(value=round(s, 1),
                           vs_baseline=round(s / baseline, 3),
                           dispatch="xla", slope_xla=round(s, 1),
                           status=status,
                           roofline=_roofline(s, "xla", headline_tier))

    # Provisional headline after ONE interleaved pass (a degraded tunnel
    # can spend 30+ s per round trip; if the watchdog fires later, the
    # artifact still carries a real slope instead of 0.0), then refine.
    mins = _min_times(fns, warmups=1, iters=1)
    s_xla = slope(mins, "xla")
    publish_xla(s_xla, "ok(xla provisional)")
    if _remaining() > 30.0:
        mins = _min_times(fns)
        s_xla = slope(mins, "xla")
    publish_xla(s_xla, "ok(xla only)")

    # Phase 2: Pallas variant if budget allows, then interleaved A/B.
    # Reserve one more compile of the observed cost plus measuring slack.
    if on_tpu and _remaining() > max(2.5 * compile_s, 90.0):
        try:
            pl_fns = make("pallas")
            fns[("pallas", n_lo)] = pl_fns[n_lo]
            fns[("pallas", n_hi)] = pl_fns[n_hi]
            float(fns[("pallas", n_hi)]())    # compile
            mins = _min_times(fns)
            s_xla = slope(mins, "xla")
            s_pl = slope(mins, "pallas")
            best = "pallas" if s_pl >= s_xla else "xla"
            val = max(s_pl, s_xla)
            _RESULT.update(value=round(val, 1),
                           vs_baseline=round(val / baseline, 3),
                           dispatch=best, slope_xla=round(s_xla, 1),
                           slope_pallas=round(s_pl, 1), status="ok",
                           roofline=_roofline(val, best, headline_tier))
        except Exception as e:               # Pallas failure: keep XLA number
            _RESULT["pallas_error"] = f"{type(e).__name__}: {e}"[:200]

    # Phase 2b: the TIME-MAJOR layout of the same serving step
    # (engine/tmajor.py: streams on the MXU lane axis, P2 on sublanes —
    # removes the 160->256 lane padding the roofline names as the
    # stream-major bound).  Same resample, same data (transposed);
    # interleaved against the phase-2 winner so tunnel drift cancels.
    # A deployment adopts it by storing streams time-major — which
    # interleaved multi-channel audio already is.
    if on_tpu and _remaining() > max(2.5 * compile_s, 90.0):
        try:
            from go_audio_resampler_tpu.engine.tmajor import \
                _step_banded_tmajor
            r_lhs = jnp.asarray(r, dtype=jnp.float32)       # [P2, Wx]
            xt_np = np.ascontiguousarray(x_np.T)            # [blk, s]

            @jax.jit
            def ft(n, xtb, rr):
                def body(_, val):
                    c, acc = val
                    c2, y, _n = _step_banded_tmajor(
                        rr, c, xtb, ipx=ipx, wx=wx, p2=p2)
                    return (c2, acc + jnp.sum(y))
                init = (jnp.zeros((carry_len, s), jnp.float32),
                        jnp.float32(0))
                _, acc = lax.fori_loop(0, n, body, init)
                return acc

            xt = jnp.asarray(xt_np)
            best0 = _RESULT.get("dispatch", "xla")
            fns_t = {
                ("tmajor", n_lo): lambda: ft(n_lo, xt, r_lhs),
                ("tmajor", n_hi): lambda: ft(n_hi, xt, r_lhs),
                ("best", n_lo): fns[(best0, n_lo)],
                ("best", n_hi): fns[(best0, n_hi)],
            }
            float(fns_t[("tmajor", n_hi)]())      # compile (one program)
            mins_t = _min_times(fns_t)
            s_tm = slope(mins_t, "tmajor")
            s_best = slope(mins_t, "best")
            _RESULT["slope_tmajor"] = round(s_tm, 1)
            _RESULT["roofline_tmajor"] = _roofline(s_tm, "tmajor",
                                                   headline_tier)
            if s_tm > max(s_best, _RESULT["value"]):
                _RESULT.update(
                    value=round(s_tm, 1),
                    vs_baseline=round(s_tm / baseline, 3),
                    dispatch="tmajor",
                    roofline=_RESULT["roofline_tmajor"], status="ok")
        except Exception as e:
            _RESULT["tmajor_error"] = f"{type(e).__name__}: {e}"[:200]

    # Phase 3 (informational, never touches the headline): the 1-pass
    # bf16 ingest tier's slope, when budget remains.  The tier is read at
    # trace time, so the inner step's jit cache must be cleared around
    # the env flip; the already-compiled exact-tier executables are
    # unaffected.  Quality at this tier is pinned separately
    # (QUALITY_tpu.json thd_44k_48k_high_ingest_tier_db ~ -70.6 dB).
    if on_tpu and _remaining() > max(2.5 * compile_s, 90.0):
        try:
            from go_audio_resampler_tpu.engine import streaming as _strm
            from go_audio_resampler_tpu.ops import pallas_fused as _pf
            _prev_tier = os.environ.get("GAR_TPU_MATMUL_PRECISION")
            os.environ["GAR_TPU_MATMUL_PRECISION"] = "default"
            # The tier is read at TRACE time by both the step wrapper and
            # the Pallas kernel's own jit — clear both or the stale
            # HIGHEST-tier kernel trace is silently reused.
            _strm._step_rational_fused.clear_cache()
            _pf.fused_resample_pallas.clear_cache()
            try:
                ing = make("pallas")
                fns_i = {("ingest", n_lo): ing[n_lo],
                         ("ingest", n_hi): ing[n_hi]}
                float(fns_i[("ingest", n_hi)]())     # compile
                mins_i = _min_times(fns_i, iters=8)
                s_ing = slope(mins_i, "ingest")
                _RESULT["slope_ingest_tier"] = round(s_ing, 1)
                if s_ing > 0:
                    _RESULT["roofline_ingest"] = _roofline(
                        s_ing, "pallas", "default")
            finally:
                if _prev_tier is None:
                    os.environ.pop("GAR_TPU_MATMUL_PRECISION", None)
                else:
                    os.environ["GAR_TPU_MATMUL_PRECISION"] = _prev_tier
                _strm._step_rational_fused.clear_cache()
                _pf.fused_resample_pallas.clear_cache()
        except Exception as e:
            _RESULT["ingest_error"] = f"{type(e).__name__}: {e}"[:200]

    # Phases 4-5 (informational, never touch the headline): the other
    # flagship paths, driver-tracked so per-round regressions on them are
    # visible without a by-hand run_all.py session (round-4 verdict
    # item 8): the ML-ingest integer-decimation step (BASELINE config 5)
    # and the general non-exact-ratio streaming walk.
    def _chain_slope(core, st0, x, depths):
        """Depth slope of a chained core_fn — same methodology as the
        headline: one compiled dynamic-trip-count program, minimum over
        interleaved timings, marginal samples / marginal time."""
        @jax.jit
        def f(n, xx):
            def body(_, val):
                st, acc = val
                st2, y, _n = core(st, xx)
                return (st2, acc + jnp.sum(y))
            _, acc = lax.fori_loop(0, n, body, (st0, jnp.float32(0)))
            return acc

        lo, hi = depths
        fns = {lo: lambda: f(lo, x), hi: lambda: f(hi, x)}
        float(fns[hi]())                  # compile (one program)
        mins = _min_times(fns, iters=6)
        tlo, thi = mins[lo], mins[hi]
        if not (np.isfinite(tlo) and np.isfinite(thi)):
            return 0.0
        return (hi - lo) * x.shape[0] * x.shape[1] / max(thi - tlo,
                                                         1e-9) / 1e6

    if on_tpu and _remaining() > max(2.5 * compile_s, 120.0):
        try:
            from go_audio_resampler_tpu.engine.streaming import EngineCore
            plan_d = plan_engine(48000.0, 16000.0, Quality.HIGH)
            eng_d = EngineCore(plan_d, batch=256, block=2048,
                               dtype=jnp.float32)
            x_d = jnp.asarray(rng.normal(
                size=(256, eng_d.block)).astype(np.float32) * 0.5)
            s_d = _chain_slope(eng_d.core_fn(), eng_d._init_state(), x_d,
                               (8, 136))
            if s_d > 0:
                _RESULT["slope_ml_ingest"] = round(s_d, 1)
                m_d = banded_model(eng_d._decim_p2, eng_d._decim_wx,
                                   eng_d._decim_ipx)
                _RESULT["roofline_ml_ingest"] = analyze(
                    s_d, m_d, tier=headline_tier, peaks=peaks)
        except Exception as e:
            _RESULT["ml_ingest_error"] = f"{type(e).__name__}: {e}"[:200]

    if on_tpu and _remaining() > max(2.5 * compile_s, 120.0):
        try:
            from go_audio_resampler_tpu.engine.streaming import EngineCore
            from go_audio_resampler_tpu.utils.roofline import general_model
            plan_g = plan_engine(44100.0, 48001.0, Quality.HIGH)
            eng_g = EngineCore(plan_g, batch=256, block=2048,
                               dtype=jnp.float32)
            x_g = jnp.asarray(rng.normal(
                size=(256, eng_g.block)).astype(np.float32) * 0.5)
            s_g = _chain_slope(eng_g.core_fn(), eng_g._init_state(), x_g,
                               (8, 136))
            if s_g > 0:
                _RESULT["slope_general"] = round(s_g, 1)
                m_g = general_model(
                    factor=plan_g.factor, pre_taps=plan_g.pre_taps,
                    poly_taps=plan_g.poly_taps,
                    num_phases=plan_g.num_phases, step_hi=plan_g.step_hi,
                    block=eng_g.block, poly_cap=eng_g.poly_cap)
                _RESULT["roofline_general"] = analyze(
                    s_g, m_g, tier=headline_tier, peaks=peaks)
        except Exception as e:
            _RESULT["general_error"] = f"{type(e).__name__}: {e}"[:200]

    _emit()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        _RESULT["status"] = f"error: {type(e).__name__}: {e}"[:300]
        _emit()
        sys.exit(0 if _RESULT.get("value") else 1)
