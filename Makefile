# Top-level build/test entry points (SURVEY.md §2.1 E14 — the reference's
# build system is a VS2015 solution; ours is make + pyproject).
#
#   make native    build the C++ decode layer (libpmt_native.so)
#   make test      native build + default-tier suite on a faked 8-device
#                  mesh (xdist, 2 workers — same shape as CI; a single
#                  long-lived pytest process accumulates hundreds of
#                  XLA-CPU executables and was observed to segfault in
#                  late compiles, so the tiered/xdist form is canonical)
#   make test-slow the slow tier (long SfM/SLAM sequences), xdist
#   make test-tpu  the real-TPU compiled-kernel tests (needs one free chip)
#   make bench    the benchmark harness (one JSON line)
#   make dryrun   the 8-device multi-chip sharding dry run (CPU-faked)

PYTHON ?= python

.PHONY: native test test-slow test-tpu bench dryrun clean

native:
	$(MAKE) -C native

test: native
	$(PYTHON) -m pytest tests/ -q -m "not slow" -n 2

test-slow: native
	$(PYTHON) -m pytest tests/ -q -m slow -n 2

test-tpu:
	PMT_TPU_TESTS=1 $(PYTHON) -m pytest tests/test_tpu_compiled.py -q

bench:
	$(PYTHON) bench.py

dryrun:
	$(PYTHON) __graft_entry__.py --dryrun

clean:
	$(MAKE) -C native clean
