# Role parity with the reference's Makefiles (reference Makefile:1-22,
# lib Makefile:1-21): test, docs, clean.

.PHONY: test test-all bench suite clean

test:
	python -m pytest tests/ -q

test-all:  # includes slow-marked breadth sweeps and multi-process tests
	python -m pytest tests/ -q -m "slow or not slow"

bench:
	python bench.py

suite:
	python benchmarks/suite.py

clean:
	rm -rf **/__pycache__ .pytest_cache sparse_tpu/io/_fastmm.so
