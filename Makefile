# Role parity with the reference's Makefiles (reference Makefile:1-22,
# lib Makefile:1-21): test, docs, clean.

.PHONY: test bench suite clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

suite:
	python benchmarks/suite.py

clean:
	rm -rf **/__pycache__ .pytest_cache sparse_tpu/io/_fastmm.so
