# Top-level orchestration: native library, tests, benchmarks.
.PHONY: all native test test-fast bench bench-scale soak clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x --ignore=tests/test_reference_fuzz.py

bench: native
	python bench.py

bench-scale: native
	python bench_scale.py

soak: native  # randomized differential campaign vs the reference binary
	python tools/fuzz_soak.py --trials 100

clean:
	$(MAKE) -C native clean
