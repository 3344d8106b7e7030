# Convenience targets (the reference's Makefile analogue; everything is
# also runnable directly with python -m ...)

.PHONY: all native test test-full test-fast bench entry clean ci

all: native

native: prima_tpu/native/libprima_native.so

prima_tpu/native/libprima_native.so: prima_tpu/native/convert.cpp
	g++ -O3 -shared -fPIC -std=c++17 -pthread -o $@ $<

test:  # default tier: slow-marked multi-process/e2e modules are skipped
	python -m pytest tests/ -q

test-full:  # both tiers (what CI runs)
	python -m pytest tests/ -q --runslow

test-fast:
	python -m pytest tests/ -q -x

bench:
	python bench.py

entry:
	python __graft_entry__.py

ci:
	bash ci/run.sh

clean:
	rm -f prima_tpu/native/libprima_native.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
