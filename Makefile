# Build/test/bench entry points (Taskfile.yml counterpart of the reference).

PY ?= python

.PHONY: test test-quick bench bench-all bench-baseline bench-check lint \
	native clean quality-tpu

test: native
	$(PY) -m pytest tests/ -q

test-quick: native
	$(PY) -m pytest tests/ -q -x -k "not quality"

bench:
	$(PY) bench.py

bench-all:
	$(PY) benchmarks/run_all.py

# Snapshot the current results as the regression baseline (same backend).
bench-baseline:
	cp benchmarks/results.json benchmarks/baseline_tpu.json

# Re-run the matrix and fail on a >20% regression vs the committed baseline
# (benchstat analog of the reference's benchmark workflow).
bench-check: bench-all
	$(PY) benchmarks/check_regression.py benchmarks/results.json \
		benchmarks/baseline_tpu.json --tolerance 0.20

# Quality metrics measured on ACTUAL TPU float32 output via the default
# (Pallas) paths, plus compiled Pallas-vs-XLA parity; writes
# QUALITY_tpu.json and fails on any floor/parity violation.
quality-tpu:
	$(PY) tools/quality_tpu.py

lint:
	$(PY) tools/lintcheck.py go_audio_resampler_tpu tests bench.py __graft_entry__.py

native:
	$(MAKE) -s -C go_audio_resampler_tpu/native

clean:
	$(MAKE) -s -C go_audio_resampler_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
