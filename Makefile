# Top-level build/test entry points (SURVEY.md §2.1 E14 — the reference's
# build system is a VS2015 solution; ours is make + pyproject).
#
#   make native   build the C++ decode layer (libpmt_native.so)
#   make test     native build + full pytest suite on a faked 8-device mesh
#   make test-tpu the real-TPU compiled-kernel tests (needs one free chip)
#   make bench    the benchmark harness (one JSON line)
#   make dryrun   the 8-device multi-chip sharding dry run (CPU-faked)

PYTHON ?= python

.PHONY: native test test-tpu bench dryrun clean

native:
	$(MAKE) -C native

test: native
	$(PYTHON) -m pytest tests/ -q

test-tpu:
	PMT_TPU_TESTS=1 $(PYTHON) -m pytest tests/test_tpu_compiled.py -q

bench:
	$(PYTHON) bench.py

dryrun:
	$(PYTHON) __graft_entry__.py --dryrun

clean:
	$(MAKE) -C native clean
