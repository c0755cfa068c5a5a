# Dev ergonomics for cvml_goalnet_tpu.
PY ?= python

test:            ## full suite on CPU (8 virtual devices)
	$(PY) -m pytest tests/ -q -rs

test-fast:       ## fast lane: skips subprocess/scale/multihost suites
	$(PY) -m pytest tests/ -q -rs -m "not slow"

bench:           ## one-chip throughput benchmark (JSON line)
	$(PY) bench.py

bench-all: bench
	$(PY) benchmarks/train_bench.py
	$(PY) benchmarks/summarize_latency_bench.py
	$(PY) benchmarks/match_stream_bench.py

native:          ## build the C++ host runtime
	$(MAKE) -C runtime

graft:           ## driver contract: compile check + multi-chip dry run
	XLA_FLAGS=--xla_force_host_platform_device_count=8 GOALNET_PLATFORM=cpu $(PY) __graft_entry__.py

clean:
	$(MAKE) -C runtime clean
	rm -rf .pytest_cache

.PHONY: test test-fast bench bench-all native graft clean
