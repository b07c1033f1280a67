# Build/test/bench entry points (Taskfile.yml counterpart of the reference).

PY ?= python

.PHONY: test test-quick bench lint native clean

test: native
	$(PY) -m pytest tests/ -q

test-quick: native
	$(PY) -m pytest tests/ -q -x -k "not quality"

bench:
	$(PY) bench.py

lint:
	$(PY) tools/lintcheck.py go_audio_resampler_tpu tests bench.py __graft_entry__.py

native:
	$(MAKE) -s -C go_audio_resampler_tpu/native

clean:
	$(MAKE) -s -C go_audio_resampler_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
