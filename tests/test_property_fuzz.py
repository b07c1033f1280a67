"""Seeded property fuzzing: random chunk patterns and rates vs the oracle.

Randomized (but deterministic) sweep over ratios, qualities, chunk
patterns and block sizes, asserting the two framework-level invariants:

1. streaming(chunks) == oneshot(concat(chunks))   (chunking invariance)
2. oneshot == serial oracle                       (semantics parity)

This is the property-based analog of the reference's Go fuzz tier
(fuzz_test.go) adapted to deterministic CI.
"""

import numpy as np
import pytest

from go_audio_resampler_tpu.engine import EngineCore, plan_engine, oneshot
from go_audio_resampler_tpu.filterdesign import Quality

from oracle import oracle_oneshot

RATES = [8000, 11025, 16000, 22050, 32000, 44100, 48000, 88200, 96000]
QUALITIES = [Quality.QUICK, Quality.LOW, Quality.MEDIUM, Quality.HIGH,
             Quality.VERY_HIGH]


def random_chunks(rng, total):
    chunks = []
    left = total
    while left > 0:
        c = int(rng.integers(1, min(left, 1500) + 1))
        chunks.append(c)
        left -= c
    return chunks


@pytest.mark.parametrize("seed", range(8))
def test_random_config_invariants(seed):
    rng = np.random.default_rng(1000 + seed)
    inr, outr = rng.choice(RATES, size=2, replace=False)
    q = QUALITIES[int(rng.integers(len(QUALITIES)))]
    n = int(rng.integers(500, 4000))
    block = int(rng.choice([128, 384, 512, 1024]))
    x = rng.normal(size=n) * 0.5

    plan = plan_engine(float(inr), float(outr), q)
    ref = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]

    # invariant 1: chunked streaming reproduces the canonical stream
    eng = EngineCore(plan, batch=1, block=block, dtype=np.float64)
    outs = []
    off = 0
    for c in random_chunks(rng, n):
        outs.append(eng.process(x[off:off + c])[0])
        off += c
    outs.append(eng.flush()[0])
    got = np.concatenate(outs)
    assert got.shape == ref.shape, (inr, outr, q, block)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12,
                               err_msg=f"{inr}->{outr} q={q} block={block}")

    # invariant 2: canonical stream matches the serial oracle
    expect = oracle_oneshot(plan, x)
    assert ref.shape == expect.shape
    np.testing.assert_allclose(ref, expect, rtol=1e-9, atol=1e-12,
                               err_msg=f"{inr}->{outr} q={q} oracle")


# Ratio-extreme sweep: the full valid range [1/256, 256] including the
# clamp boundaries and awkward near-integer / near-boundary ratios
# (fuzz_test.go's ratio dimension, widened per VERDICT r1).
EXTREME_RATIOS = [
    (1.0, 256.0), (256.0, 1.0),              # exact clamp boundaries
    (1000.0, 255999.0), (255999.0, 1000.0),  # just inside the clamps
    (1000.0, 1001.0), (1001.0, 1000.0),      # barely off unity
    (1000.0, 2001.0), (2001.0, 1000.0),      # barely off integer 2x
    (44100.0, 44100.0),                      # exact unity
    (7.0, 1792.0), (1792.0, 7.0),            # integer 256x via odd rates
]


@pytest.mark.parametrize("inr,outr", EXTREME_RATIOS)
@pytest.mark.parametrize("q", [Quality.QUICK, Quality.LOW, Quality.HIGH])
def test_ratio_extremes_vs_oracle(inr, outr, q):
    rng = np.random.default_rng(int(inr * 7 + outr))
    n = 300 if outr / inr > 64 else 1200
    x = rng.normal(size=n) * 0.5
    plan = plan_engine(inr, outr, q)
    ref = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
    expect = oracle_oneshot(plan, x)
    assert ref.shape == expect.shape, (inr, outr, q)
    np.testing.assert_allclose(ref, expect, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("inr,outr", [(1.0, 256.0), (256.0, 1.0),
                                      (1000.0, 255999.0)])
def test_ratio_extremes_streaming(inr, outr):
    # streaming must also hold at the clamp boundaries (the int32 walk
    # clamps are exercised hardest here)
    rng = np.random.default_rng(3)
    n = 700
    x = rng.normal(size=n) * 0.5
    plan = plan_engine(inr, outr, Quality.LOW)
    ref = np.asarray(oneshot(plan, x[None], dtype=np.float64))[0]
    eng = EngineCore(plan, batch=1, block=2048, dtype=np.float64)
    got = np.concatenate([eng.process(x)[0], eng.flush()[0]])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


# Round-3 surfaces: the functional op and the python-soxr shim must obey
# the same invariants (they are thin layers over the engine; the fuzz
# here guards the LAYERS — layout transposes, dtype plumbing, chunk
# orchestration — against drift).

@pytest.mark.parametrize("seed", range(4))
def test_functional_op_matches_oneshot(seed):
    import go_audio_resampler_tpu as gar
    from go_audio_resampler_tpu.convenience import preset_to_engine_quality

    rng = np.random.default_rng(7000 + seed)
    inr, outr = rng.choice(RATES, size=2, replace=False)
    preset = gar.QualityPreset(int(rng.integers(5)))
    n = int(rng.integers(400, 3000))
    x = (rng.normal(size=(2, n)) * 0.5).astype(np.float64)

    y = np.asarray(gar.resample(x, float(inr), float(outr), quality=preset))
    plan = plan_engine(float(inr), float(outr),
                       preset_to_engine_quality(preset))
    ref = np.asarray(oneshot(plan, x, dtype=np.float64))
    assert y.shape == ref.shape, (inr, outr, preset)
    np.testing.assert_allclose(y, ref, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("seed", range(4))
def test_soxr_compat_stream_invariant(seed):
    from go_audio_resampler_tpu import soxr_compat as soxr

    rng = np.random.default_rng(8000 + seed)
    inr, outr = rng.choice(RATES, size=2, replace=False)
    ch = int(rng.integers(1, 4))
    n = int(rng.integers(400, 3000))
    q = ["QQ", "LQ", "MQ", "HQ", "VHQ"][int(rng.integers(5))]
    shape = (n,) if ch == 1 else (n, ch)
    x = (rng.normal(size=shape) * 0.5).astype(np.float32)

    ref = soxr.resample(x, float(inr), float(outr), quality=q)
    st = soxr.ResampleStream(float(inr), float(outr), ch, quality=q)
    outs, off = [], 0
    for c in random_chunks(rng, n):
        outs.append(st.resample_chunk(x[off:off + c]))
        off += c
    outs.append(st.resample_chunk(x[:0], last=True))
    got = np.concatenate(outs, axis=0)
    assert got.shape == ref.shape, (inr, outr, ch, q)
    np.testing.assert_allclose(got, ref, rtol=0, atol=4e-6)


# Round-4 surface: the pipelined stream() generator is a reordering of
# the same launches (one-chunk download lag) and must be invariant to
# the chunk pattern, equal to process+flush, across random configs.

@pytest.mark.parametrize("seed", range(6))
def test_pipelined_stream_invariant(seed):
    rng = np.random.default_rng(9000 + seed)
    inr, outr = rng.choice(RATES, size=2, replace=False)
    q = QUALITIES[int(rng.integers(len(QUALITIES)))]
    n = int(rng.integers(500, 6000))
    batch = int(rng.integers(1, 4))
    block = int(rng.choice([512, 2048]))
    x = (rng.normal(size=(batch, n)) * 0.5).astype(np.float64)

    plan = plan_engine(float(inr), float(outr), q)
    ref_eng = EngineCore(plan, batch=batch, block=block, dtype=np.float64)
    ref = np.concatenate([ref_eng.process(x), ref_eng.flush()], axis=1)

    eng = EngineCore(plan, batch=batch, block=block, dtype=np.float64)
    cuts = np.cumsum([0] + random_chunks(rng, n))
    chunks = [x[:, a:b] for a, b in zip(cuts, cuts[1:])]
    got_list = list(eng.stream(chunks))
    got = (np.concatenate(got_list, axis=1) if got_list
           else np.zeros((batch, 0)))
    assert got.shape == ref.shape, (inr, outr, q, n, block)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)
