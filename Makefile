# Dev ergonomics for cvml_goalnet_tpu.
PY ?= python

test:            ## full suite, sharded across fresh processes (one process segfaults XLA)
	$(PY) tools/run_suite.py

test-fast:       ## fast lane: skips subprocess/scale/multihost suites
	$(PY) tools/run_suite.py -m "not slow"

test-one:        ## single-process run (debug only; whole-suite runs segfault near the end)
	$(PY) -m pytest tests/ -q -rs

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

.PHONY: test test-fast test-one bench bench-all native graft clean
