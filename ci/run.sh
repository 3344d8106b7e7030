#!/usr/bin/env bash
# CI pipeline (the reference's ci/run.sh analogue): build native, run the
# full suite on the virtual CPU mesh, then end-to-end smoke jobs — synth
# model build, quantize, perplexity, CLI decode, 2-process distributed ring.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build =="
make native

echo "== test suite: default tier (virtual 8-device CPU mesh) =="
python -m pytest tests/ -q

echo "== test suite: slow tier (multi-process ring/server e2e) =="
python -m pytest tests/ -q --runslow -m slow

echo "== sanitizer tier (native TSan) =="
make native-tsan

echo "== e2e smoke: model build + quantize + ppl + cli =="
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
python -m prima_tpu.tools.make_tiny_gguf "$TMP/tiny.gguf"
python -m prima_tpu.tools.quantize "$TMP/tiny.gguf" "$TMP/q8.gguf" Q8_0 2>/dev/null | tail -1
python - <<PYEOF
with open("$TMP/corpus.txt", "w") as f:
    f.write("the quick brown fox jumps over the lazy dog. " * 40)
PYEOF
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.perplexity \
    -m "$TMP/q8.gguf" -f "$TMP/corpus.txt" -c 64 --chunks 1 --matmul xla 2>/dev/null | tail -1
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.cli \
    -m "$TMP/tiny.gguf" -p "Hello" -n 6 --temp 0 --matmul xla --no-display-prompt

echo "== e2e smoke: imatrix + weighted quantize + lookup + bench matrix =="
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.imatrix \
    -m "$TMP/tiny.gguf" -f "$TMP/corpus.txt" -o "$TMP/t.imatrix" -c 32 --chunks 2 2>/dev/null
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.quantize \
    "$TMP/tiny.gguf" "$TMP/q4im.gguf" Q4_K_M --imatrix "$TMP/t.imatrix" 2>/dev/null | tail -1
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.lookup create \
    -m "$TMP/tiny.gguf" -f "$TMP/corpus.txt" -o "$TMP/static.bin"
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.lookup stats \
    -m "$TMP/tiny.gguf" -f "$TMP/corpus.txt" -lcs "$TMP/static.bin" | tail -1
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.bench_tool \
    -m "$TMP/tiny.gguf" -p 16 -n 4 -r 1 -c 64 -o md 2>/dev/null | tail -2

echo "== e2e smoke: aux tools (tokenize/hash/stats/speculative/export-lora) =="
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.tokenize \
    -m "$TMP/tiny.gguf" -p "hello world" --show-count | tail -1
python -m prima_tpu.tools.gguf_hash "$TMP/tiny.gguf" | tail -1
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.quantize_stats \
    -m "$TMP/tiny.gguf" --type q8_0 | tail -1
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.speculative \
    -m "$TMP/tiny.gguf" -md "$TMP/tiny.gguf" -p "Hi" -n 4 --matmul xla --temp 0 2>/dev/null | tail -1
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.batched_bench \
    -m "$TMP/tiny.gguf" -npp 8 -ntg 4 -npl 1 -c 64 --matmul xla | tail -1

echo "== e2e smoke: lookahead/batched/embedding/infill/llama2c =="
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.lookahead \
    -m "$TMP/tiny.gguf" -p "Hello" -n 6 --temp 0 --matmul xla \
    --lookahead-w 4 --lookahead-n 3 --lookahead-g 4 2>/dev/null | tail -1
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.batched \
    -m "$TMP/tiny.gguf" -p "Hello" -np 2 -n 4 -c 64 --matmul xla 2>/dev/null | tail -2
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.embedding \
    -m "$TMP/tiny.gguf" -p 'a b\nc d' -c 64 --matmul xla 2>/dev/null | tail -2
python - <<PYEOF
# tiny llama2.c checkpoint for the converter smoke
import struct, numpy as np
dim, hid, L, H, KV, V, S = 32, 48, 1, 4, 2, 32, 8
rng = np.random.default_rng(0)
with open("$TMP/ak.bin", "wb") as f:
    f.write(struct.pack("<7i", dim, hid, L, H, KV, V, S))
    for shape in [(V, dim), (L, dim), (L, dim, dim), (L, dim * KV // H, dim),
                  (L, dim * KV // H, dim), (L, dim, dim), (L, dim),
                  (L, hid, dim), (L, dim, hid), (L, hid, dim), (dim,)]:
        f.write(rng.standard_normal(shape).astype(np.float32).tobytes())
    f.write(np.zeros(S * dim // H, np.float32).tobytes())
with open("$TMP/ak_tok.bin", "wb") as f:
    f.write(struct.pack("<I", 8))
    for i in range(V):
        t = f"t{i}".encode()
        f.write(struct.pack("<fI", 0.0, len(t)) + t)
PYEOF
python -m prima_tpu.tools.convert_llama2c --copy-vocab-from-model "$TMP/ak_tok.bin" \
    --llama2c-model "$TMP/ak.bin" --llama2c-output-model "$TMP/ak.gguf" 2>&1 | tail -1
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python - <<PYEOF
# infill (FIM-capable fixture) + gritlm non-causal embed smokes
from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf
make_tiny_gguf("$TMP/fim.gguf", seed=3,
               extra_tokens=["<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>"])
from prima_tpu.tools.infill import main as infill_main
assert infill_main(["-m", "$TMP/fim.gguf", "--in-prefix", "def f():",
                    "--in-suffix", "return x", "-n", "4", "--temp", "0",
                    "--matmul", "xla", "-c", "64"]) == 0
from prima_tpu.tools.gritlm import main as gritlm_main
assert gritlm_main(["-m", "$TMP/tiny.gguf", "--mode", "embed",
                    "-p", "a b\\nc d", "--matmul", "xla"]) == 0
PYEOF

echo "== e2e smoke: 2-process distributed ring =="
PORT=$(( (RANDOM % 2000) + 20000 ))
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.cli \
    -m "$TMP/tiny.gguf" -c 64 --matmul xla -w 2 -lw "1,1" --rank 1 --data-port "$PORT" &
WORKER=$!
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.cli \
    -m "$TMP/tiny.gguf" -c 64 --matmul xla -w 2 -lw "1,1" --rank 0 --data-port "$PORT" \
    -p "Hello" -n 6 --temp 0 --no-display-prompt
wait $WORKER

echo "== e2e smoke: ring engine features (quantized KV + Self-Extend) =="
PORT=$(( (RANDOM % 2000) + 22000 ))
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.cli \
    -m "$TMP/tiny.gguf" -c 64 --matmul xla -w 2 -lw "1,1" --rank 1 --data-port "$PORT" -ctk q8_0 &
WORKER=$!
JAX_PLATFORMS=cpu PRIMA_PALLAS_INTERPRET=1 python -m prima_tpu.tools.cli \
    -m "$TMP/tiny.gguf" -c 64 --matmul xla -w 2 -lw "1,1" --rank 0 --data-port "$PORT" \
    -p "Hello" -n 6 --temp 0 --no-display-prompt -ctk q8_0 -gan 2 -gaw 8
wait $WORKER

echo "== driver entry points =="
python __graft_entry__.py

echo "CI OK"
