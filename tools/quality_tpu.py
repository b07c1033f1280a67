"""Measure quality metrics on ACTUAL TPU output via the default paths.

The CPU x64 suite (tests/) proves the math; this artifact proves the
*shipped* compute path: float32 on the real TPU backend with the Pallas
kernels default-on.  It runs the THD / DC-gain / anti-alias / ripple
metrics on device output, asserts the float32 floors the suite pins
(tests/test_quality_f32.py), runs compiled Pallas-vs-XLA parity checks
for the rational, decimation and general kernels, and writes
QUALITY_tpu.json next to BENCH_r*.json for the record.

Reference anchor: the Go suite measures its quality thresholds against
the same engine it ships (quality_regression_test.go:26-58); this is the
TPU-hardware equivalent.

Usage:  python tools/quality_tpu.py [--out QUALITY_tpu.json] [--allow-cpu]
Exit code 1 if any floor or parity check fails.
"""

from __future__ import annotations

import argparse
import importlib
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N = 65536
FFT = 16384


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="QUALITY_tpu.json")
    ap.add_argument("--allow-cpu", action="store_true",
                    help="run on a non-TPU backend (smoke only; the "
                         "artifact is only meaningful on TPU)")
    args = ap.parse_args()

    import jax
    from go_audio_resampler_tpu.engine import plan_engine
    from go_audio_resampler_tpu.filterdesign import Quality
    from go_audio_resampler_tpu.utils import metrics, signals
    osm = importlib.import_module('go_audio_resampler_tpu.engine.oneshot')

    backend = jax.default_backend()
    if backend != "tpu" and not args.allow_cpu:
        print(f"refusing to run on backend {backend!r} "
              "(pass --allow-cpu for a smoke run)")
        return 1

    results: dict = {"backend": backend, "dtype": "float32", "checks": {}}
    failures = []

    def record(name, value, ok, note=""):
        results["checks"][name] = {"value": value, "pass": bool(ok),
                                   **({"note": note} if note else {})}
        status = "ok  " if ok else "FAIL"
        print(f"  [{status}] {name} = {value}")
        if not ok:
            failures.append(name)

    def run(plan, x):
        return np.asarray(osm.oneshot(plan, np.asarray(x, np.float32)[None],
                                      dtype=np.float32))[0].astype(np.float64)

    # --- THD floors (f32, default/Pallas path) ---------------------------
    print("THD floors on device output:")
    for q, floor in [(Quality.LOW, -130.0), (Quality.HIGH, -140.0),
                     (Quality.VERY_HIGH, -140.0)]:
        plan = plan_engine(44100.0, 48000.0, q)
        y = run(plan, signals.sine(N, 1000.0, 44100))
        val = metrics.thd(y, 48000, 1000.0, FFT)
        record(f"thd_44k_48k_{q.name.lower()}_db", round(val, 2),
               val <= floor, f"floor {floor}")

    # --- decimation THD + steady-state anti-alias ------------------------
    plan = plan_engine(96000.0, 48000.0, Quality.HIGH)
    y = run(plan, signals.sine(N, 1000.0, 96000))
    val = metrics.thd(y, 48000, 1000.0, FFT)
    record("thd_96k_48k_high_db", round(val, 2), val <= -130.0,
           "floor -130")

    # alias rejection: tone above the output Nyquist must vanish
    f_alias = 30000.0   # 96k tone at 30 kHz -> aliases to 18 kHz at 48k out
    x = signals.sine(N, f_alias, 96000)
    y = run(plan, x)
    mid = y[len(y) // 4: -len(y) // 4]
    att = -20.0 * np.log10(max(np.sqrt(np.mean(mid ** 2)) * np.sqrt(2.0),
                               1e-12))
    record("alias_rejection_96k_48k_db", round(att, 1), att >= 100.0,
           "floor 100 (f32 noise floor bounds this, not the filter)")

    # --- DC gain ----------------------------------------------------------
    plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
    y = run(plan, signals.dc(16384))
    dc = metrics.dc_gain(y)
    record("dc_gain_44k_48k_high", round(float(dc), 6),
           abs(dc - 1.0) <= 1e-3, "|dc-1| <= 1e-3")

    # --- passband ripple --------------------------------------------------
    freqs = [1000.0, 5000.0, 10000.0, 15000.0]
    amps = []
    for f in freqs:
        y = run(plan, signals.sine(N, f, 44100))
        mid = y[len(y) // 4: -len(y) // 4]
        amps.append(np.sqrt(np.mean(mid ** 2)) * np.sqrt(2.0))
    ripple = 20.0 * np.log10(max(amps) / min(amps))
    record("passband_ripple_44k_48k_db", round(float(ripple), 4),
           ripple <= 2.0, "floor 2.0 dB p-p")

    # --- streaming engine on hardware (banded poly emit default-on) ------
    # The one-shot checks above never touch EngineCore's stateful per-
    # block kernels; this tier runs a chunked stream at a NON-exact ratio
    # (the banded-tile emit path) and pins both an absolute THD floor and
    # consistency with the one-shot lowering of the same plan.
    print("Streaming engine (non-exact ratio) on device output:")
    from go_audio_resampler_tpu.engine import EngineCore
    plan = plan_engine(44100.0, 48001.0, Quality.HIGH)
    xs = signals.sine(N, 1000.0, 44100).astype(np.float32)
    eng = EngineCore(plan, batch=1, block=4096, dtype=np.float32)
    chunks = [eng.process(xs[None, i:i + 4096])
              for i in range(0, len(xs), 4096)]
    chunks.append(eng.flush())
    y_s = np.concatenate([c[0] for c in chunks]).astype(np.float64)
    val = metrics.thd(y_s, 48001, 1000.0, FFT)
    record("thd_stream_44k_48k001_high_db", round(val, 2), val <= -85.0,
           "floor -85: the cubic inter-phase coefficient interpolation "
           "bounds non-exact ratios (~-88.7 in float64 too, same walk "
           "semantics as the reference; exact-rational paths measure "
           "-155)")
    y_o = run(plan, xs)
    m = min(len(y_s), len(y_o))
    d = float(np.abs(y_s[:m] - y_o[:m]).max())
    record("stream_vs_oneshot_general_maxdiff", d,
           len(y_s) == len(y_o) and d <= 2e-5, "tol 2e-5, equal lengths")

    # --- compiled Pallas-vs-XLA parity (the kernels the defaults ship) ---
    print("Compiled Pallas-vs-XLA parity (hardware numerics):")
    import os as _os
    rng = np.random.default_rng(0)

    def parity(name, inr, outr, q, n=44100, tol=2e-5):
        plan = plan_engine(float(inr), float(outr), q)
        x = (rng.normal(size=(64, n)) * 0.5).astype(np.float32)
        y_def = np.asarray(osm.oneshot(plan, x, dtype=np.float32))
        _os.environ['GAR_TPU_USE_PALLAS'] = '0'
        osm._oneshot_jit.clear_cache()
        try:
            y_xla = np.asarray(osm.oneshot(plan, x, dtype=np.float32))
        finally:
            del _os.environ['GAR_TPU_USE_PALLAS']
            osm._oneshot_jit.clear_cache()
        d = float(np.abs(y_def - y_xla).max())
        record(f"pallas_parity_{name}_maxdiff", d, d <= tol, f"tol {tol}")

    if backend == "tpu":
        parity("rational_cd_dat", 44100, 48000, Quality.HIGH)
        parity("decimation_2x", 96000, 48000, Quality.HIGH)
        parity("general_44k_48k001", 44100, 48001, Quality.HIGH)
    else:
        print("  (skipped off-TPU: the Pallas dispatch gate is closed)")

    # --- opt-in 3-pass matmul tier (GAR_TPU_MATMUL_PRECISION=high) -------
    # Not a preset floor (no preset ships this tier); the artifact pins
    # the DOCUMENTED quality of the fast serving tier (doc.md "Numerical
    # behavior": ~-117 dB THD) so a kernel/limb-split regression that
    # degrades it below ~19-bit quality fails the round.
    # The tier is read at trace time by BOTH the one-shot wrapper and
    # the Pallas kernel's own jit; clear both around each flip or a
    # stale trace from an earlier section is silently reused (the
    # kernel is reachable at the DEFAULT tier since the gate opened).
    from go_audio_resampler_tpu.ops import pallas_fused as pf

    def _tier_clear():
        osm._oneshot_jit.clear_cache()
        pf.fused_resample_pallas.clear_cache()

    _tier_prev = _os.environ.get('GAR_TPU_MATMUL_PRECISION')

    def _tier_restore():
        if _tier_prev is None:
            _os.environ.pop('GAR_TPU_MATMUL_PRECISION', None)
        else:
            _os.environ['GAR_TPU_MATMUL_PRECISION'] = _tier_prev
        _tier_clear()

    print("Fast matmul tier (bf16x3) on device output:")
    _os.environ['GAR_TPU_MATMUL_PRECISION'] = 'high'
    _tier_clear()
    try:
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        y = run(plan, signals.sine(N, 1000.0, 44100))
        val = metrics.thd(y, 48000, 1000.0, FFT)
        record("thd_44k_48k_high_fast_tier_db", round(val, 2), val <= -110.0,
               "floor -110 (documented ~-117; opt-in tier, not a preset)")
    finally:
        _tier_restore()

    # --- opt-in 1-pass ingest tier (GAR_TPU_MATMUL_PRECISION=default) ----
    # The bf16 ML-ingest tier (72.4 Gs/s serving step, doc.md): pin its
    # DOCUMENTED quality (~-70 dB THD) so a kernel change that degrades
    # it below bf16-rounding quality fails the round.
    print("Ingest matmul tier (1-pass bf16) on device output:")
    _os.environ['GAR_TPU_MATMUL_PRECISION'] = 'default'
    _tier_clear()
    try:
        plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
        y = run(plan, signals.sine(N, 1000.0, 44100))
        val = metrics.thd(y, 48000, 1000.0, FFT)
        record("thd_44k_48k_high_ingest_tier_db", round(val, 2),
               val <= -65.0,
               "floor -65 (documented ~-70.6; opt-in tier, not a preset)")
    finally:
        _tier_restore()

    # --- HQ inter-phase mode on hardware (beyond reference, opt-in) ------
    # The general walk's default floor (-85, pinned above) is the
    # reference's bank-boundary wrap; hq_interp corrects it (see
    # filterdesign/params.cubic_phase_banks).  f64 measures -162; on the
    # f32 device path the floor is the f32 accumulation of the same walk.
    print("HQ inter-phase mode (hq_interp=True) on device output:")
    plan_hq = plan_engine(44100.0, 48001.0, Quality.HIGH, False, True)
    eng_hq = EngineCore(plan_hq, batch=1, block=4096, dtype=np.float32)
    chunks = [eng_hq.process(xs[None, i:i + 4096])
              for i in range(0, len(xs), 4096)]
    chunks.append(eng_hq.flush())
    y_hq = np.concatenate([c[0] for c in chunks]).astype(np.float64)
    val = metrics.thd(y_hq, 48001, 1000.0, FFT)
    record("thd_stream_44k_48k001_hq_interp_db", round(val, 2),
           val <= -120.0,
           "floor -120 (round-4 verdict item 3 target; f64 measures "
           "-162.1, default parity mode measures ~-88)")

    # --- soak / checkpoint-under-load on hardware (verdict item 7) -------
    # The CPU soak tier (tests/test_soak.py) never ran on TPU; this
    # bounded (~30-60 s wall) tier streams ~15 s of 8-lane audio through
    # the f32 device path in RANDOMIZED host chunks, asserts bit-equality
    # with a bulk-fed twin (same compiled per-block program -> identical
    # device launches), takes one checkpoint at a random position under
    # load and resumes bit-identically, and asserts the host-side state
    # stays bounded.
    print("Soak tier (randomized chunks, checkpoint under load):")
    import tempfile
    import time as _time
    from go_audio_resampler_tpu.engine import (load_stream_state,
                                               save_stream_state)
    t_soak = _time.monotonic()
    n_soak = 15 * 44100
    rng_s = np.random.default_rng(7)
    plan_s = plan_engine(44100.0, 48000.0, Quality.HIGH)
    x_soak = (rng_s.standard_normal((8, n_soak)) * 0.5).astype(np.float32)

    bulk = EngineCore(plan_s, batch=8, block=8192, dtype=np.float32)
    y_bulk = np.concatenate([bulk.process(x_soak), bulk.flush()], axis=1)

    # Randomized chunk seams with the checkpoint position forced onto one.
    cut = int(rng_s.integers(n_soak // 4, 3 * n_soak // 4))
    cuts = [0]
    while cuts[-1] < n_soak:
        cuts.append(min(n_soak, cuts[-1] + int(rng_s.integers(1, 70000))))
    cuts = sorted(set(cuts + [cut]))

    a = EngineCore(plan_s, batch=8, block=8192, dtype=np.float32)
    parts = []
    with tempfile.NamedTemporaryFile(suffix=".npz") as ckf:
        for lo, hi in zip(cuts, cuts[1:]):
            parts.append(a.process(x_soak[:, lo:hi]))
            if hi == cut:
                save_stream_state(a, ckf.name)
        y_a = np.concatenate(parts + [a.flush()], axis=1)
        b = EngineCore(plan_s, batch=8, block=8192, dtype=np.float32)
        load_stream_state(b, ckf.name)
    # Replay only the tail through the restored engine; its outputs must
    # splice bit-identically onto the interrupted stream's transcript.
    # parts[i] covers (cuts[i], cuts[i+1]); the ck was saved after the
    # chunk ENDING at cut, i.e. after parts[cuts.index(cut) - 1].
    n_pre = cuts.index(cut)                  # chunks fully fed before ck
    pre = np.concatenate(parts[:n_pre], axis=1)
    tail_cuts = [c for c in cuts if c >= cut]
    tail = [b.process(x_soak[:, lo:hi])
            for lo, hi in zip(tail_cuts, tail_cuts[1:])]
    y_resumed = np.concatenate([pre] + tail + [b.flush()], axis=1)

    d_bulk = (float(np.abs(y_a - y_bulk).max())
              if y_a.shape == y_bulk.shape else float("inf"))
    record("soak_random_chunks_equal_bulk_maxdiff", d_bulk, d_bulk == 0.0,
           f"{len(cuts) - 1} randomized chunks vs one bulk call over "
           "15 s x 8 lanes, bit-equal (identical compiled launches)")
    d_ck = (float(np.abs(y_resumed - y_bulk).max())
            if y_resumed.shape == y_bulk.shape else float("inf"))
    record("soak_checkpoint_resume_maxdiff", d_ck, d_ck == 0.0,
           f"checkpoint at sample {cut} under load, restored engine "
           "splices bit-identically")
    pend = a._pending.available()
    cap = getattr(a._pending, "_buf", np.zeros((1, 0))).shape[-1]
    record("soak_host_state_bounded", int(cap),
           pend < 2 * a.block and cap <= 8 * max(a.block, 70000),
           "input FIFO stays bounded over the whole soak")
    record("soak_wall_s", round(_time.monotonic() - t_soak, 1), True)

    out = pathlib.Path(args.out)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {out} — {len(failures)} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
