# Convenience targets (the reference's Makefile analogue; everything is
# also runnable directly with python -m ...)

.PHONY: all native test test-fast bench entry clean ci

all: native

native: prima_tpu/native/libprima_native.so

prima_tpu/native/libprima_native.so: prima_tpu/native/convert.cpp
	g++ -O3 -shared -fPIC -std=c++17 -pthread -o $@ $<

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_server.py \
	    --ignore=tests/test_ring_tcp.py --ignore=tests/test_bootstrap.py

bench:
	python bench.py

entry:
	python __graft_entry__.py

ci:
	bash ci/run.sh

clean:
	rm -f prima_tpu/native/libprima_native.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
