"""Benchmark: Msamples/sec/chip at 44.1k->48k stereo QualityHigh (float32).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.  Baseline = the BASELINE.json north star of
1000 Msamples/sec/chip (1 Gsample/s input throughput).

Methodology: the flagship one-shot program (prestage conv + rational
frames-matmul, engine/oneshot.py) over a batch of stereo streams, steady
state, wall-clocked with block_until_ready.  Batch and length chosen so a
launch processes ~28M samples.  Run on the real TPU by the driver; also
runs on CPU (much slower) for smoke-testing.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from go_audio_resampler_tpu.engine import plan_engine
    from go_audio_resampler_tpu.engine.oneshot import _oneshot_jit
    from go_audio_resampler_tpu.filterdesign import Quality

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    # 2 channels per stream (stereo) x streams; 1 s of audio per channel.
    n = 44100
    streams = 256 if on_tpu else 8
    plan = plan_engine(44100.0, 48000.0, Quality.HIGH)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(streams, n)).astype(np.float32) * 0.5)

    def run():
        return _oneshot_jit(plan, x, 'float32')

    # Warmup / compile
    y = run()
    jax.block_until_ready(y)

    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        y = run()
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0

    total_in_samples = streams * n * iters
    msamples_per_sec = total_in_samples / dt / 1e6
    baseline = 1000.0  # Msamples/sec/chip north star
    print(json.dumps({
        "metric": "Msamples/sec/chip 44.1k->48k stereo QualityHigh f32",
        "value": round(msamples_per_sec, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
