"""Benchmark: Msamples/sec/chip at 44.1k->48k stereo QualityHigh (float32).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.  Baseline = the BASELINE.json north star of
1000 Msamples/sec/chip (1 Gsample/s input throughput).

Methodology: the flagship one-shot program (prestage conv + rational
frames-matmul, engine/oneshot.py) over batches of stereo streams.  The
axon TPU tunnel adds ~30 ms of fixed host<->device round-trip latency per
synchronized call, so throughput is measured as the *slope* between a
small and a large batch (marginal samples / marginal time), which cancels
the fixed launch+sync overhead and reports true device throughput.  Each
timing is a median over several synchronized runs.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _min_time(fn, warmups: int = 2, iters: int = 15) -> float:
    """Minimum synchronized wall time.

    The axon tunnel adds a ~25-30 ms round trip with heavy-tailed jitter;
    the minimum estimates the stable floor (RTT + device time) far better
    than the median, so differencing two minimums isolates device time.
    On axon, block_until_ready does not synchronize with device
    completion; a scalar device_get does.
    """
    import jax
    for _ in range(warmups):
        jax.block_until_ready(fn())
        float(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn())
        times.append(time.perf_counter() - t0)
    return float(np.min(times))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from go_audio_resampler_tpu.engine import plan_engine
    from go_audio_resampler_tpu.engine.oneshot import _oneshot_jit
    from go_audio_resampler_tpu.filterdesign import Quality

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    n = 44100  # 1 s per stream; streams = stereo pairs x many
    s_small = 256 if on_tpu else 4
    s_large = 1024 if on_tpu else 16
    plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
    rng = np.random.default_rng(0)

    @jax.jit
    def run_sum(x):
        return jnp.sum(_oneshot_jit(plan, x, 'float32'))

    xs = jnp.asarray(rng.normal(size=(s_small, n)).astype(np.float32) * 0.5)
    xl = jnp.asarray(rng.normal(size=(s_large, n)).astype(np.float32) * 0.5)

    t_small = _min_time(lambda: run_sum(xs))
    t_large = _min_time(lambda: run_sum(xl))

    d_samples = (s_large - s_small) * n
    d_t = max(t_large - t_small, 1e-9)
    msamples_per_sec = d_samples / d_t / 1e6
    baseline = 1000.0  # Msamples/sec/chip north star
    print(json.dumps({
        "metric": "Msamples/sec/chip 44.1k->48k stereo QualityHigh f32",
        "value": round(msamples_per_sec, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
