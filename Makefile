# Convenience targets (the reference's Makefile analogue; everything is
# also runnable directly with python -m ...)

.PHONY: all native native-tsan native-asan test test-full test-fast bench entry clean ci

all: native

native: prima_tpu/native/libprima_native.so

prima_tpu/native/libprima_native.so: prima_tpu/native/convert.cpp prima_tpu/native/tokenize.cpp
	g++ -O3 -shared -fPIC -std=c++17 -pthread -o $@ $^

# sanitizer tier (the reference's LLAMA_SANITIZE_THREAD/ADDRESS Makefile
# flags, Makefile:370-373): rebuild the native library under TSan/ASan and
# run the native test files against it. PRIMA_NATIVE_LIB points the loader
# at the instrumented build.
native-tsan:
	g++ -O1 -g -shared -fPIC -std=c++17 -pthread -fsanitize=thread \
	    -o /tmp/libprima_native_tsan.so prima_tpu/native/convert.cpp prima_tpu/native/tokenize.cpp
	PRIMA_NATIVE_LIB=/tmp/libprima_native_tsan.so \
	    TSAN_OPTIONS="suppressions=ci/tsan.supp" \
	    LD_PRELOAD=$$(g++ -print-file-name=libtsan.so) \
	    python -m pytest tests/test_native.py tests/test_device_format.py -q

native-asan:
	g++ -O1 -g -shared -fPIC -std=c++17 -pthread -fsanitize=address \
	    -o /tmp/libprima_native_asan.so prima_tpu/native/convert.cpp prima_tpu/native/tokenize.cpp
	PRIMA_NATIVE_LIB=/tmp/libprima_native_asan.so \
	    ASAN_OPTIONS="detect_leaks=0" \
	    LD_PRELOAD=$$(g++ -print-file-name=libasan.so) \
	    python -m pytest tests/test_native.py -q
# (the wider device_format file OOMs under ASan's shadow memory with the
#  jax CPU runtime loaded; the native C++ surface is fully covered above)

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
