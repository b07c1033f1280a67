"""Basic usage example (counterpart of the reference's examples/basic).

Run:  python examples/basic.py
"""

import numpy as np

import go_audio_resampler_tpu as gar


def main():
    # 1 second of a 1 kHz sine at CD rate
    rate_in, rate_out = gar.RATE_CD, gar.RATE_DAT
    t = np.arange(rate_in) / rate_in
    x = 0.8 * np.sin(2 * np.pi * 1000.0 * t)

    # One-shot conversion (simplest API)
    y = gar.resample_mono(x, rate_in, rate_out, gar.QualityPreset.HIGH)
    print(f"one-shot: {len(x)} samples @ {rate_in} Hz -> "
          f"{len(y)} samples @ {rate_out} Hz")

    # Streaming conversion with explicit configuration
    r = gar.new_resampler(gar.Config(
        input_rate=rate_in, output_rate=rate_out, channels=1,
        quality=gar.QualitySpec(preset=gar.QualityPreset.HIGH)))
    chunks = [x[i:i + 4096] for i in range(0, len(x), 4096)]
    outs = [r.process(c) for c in chunks]
    outs.append(r.flush())
    streamed = np.concatenate(outs)
    # Streaming and one-shot produce the same canonical stream (the fused
    # one-shot kernel reorders float ops, so equality is to rounding).
    print(f"streaming: {len(streamed)} samples; matches one-shot: "
          f"{np.allclose(streamed, y, atol=1e-9)}")

    info = gar.get_info(r)
    print(f"algorithm: {info.algorithm}, taps: {info.filter_length}, "
          f"latency: {info.latency} samples, backend: {info.simd_type}")


if __name__ == "__main__":
    main()
