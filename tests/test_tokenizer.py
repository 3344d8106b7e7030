"""Tokenizer golden tests against the reference's vocab fixtures.

Uses the same .gguf.inp/.gguf.out test vectors as the reference's
test-tokenizer-0 (tests/CMakeLists.txt:73+): inputs separated by
__ggml_vocab_test__ lines, expected ids one line per input, tokenize with
add_special=False.
"""

import os

import pytest

from prima_tpu.gguf.reader import GGUFModel
from prima_tpu.tokenizer import Tokenizer

FIXDIR = "/root/reference/models"

CASES = [
    ("ggml-vocab-llama-spm", "spm"),
    ("ggml-vocab-phi-3", "spm"),
    ("ggml-vocab-gpt-2", "bpe"),
    ("ggml-vocab-deepseek-llm", "bpe"),
    ("ggml-vocab-deepseek-coder", "bpe"),
    ("ggml-vocab-falcon", "bpe"),
]


def _load_vectors(base):
    with open(base + ".inp", encoding="utf-8") as f:
        inputs = f.read().split("\n__ggml_vocab_test__\n")
    with open(base + ".out", encoding="utf-8") as f:
        outputs = [[int(x) for x in line.split()] for line in f.read().splitlines()]
    # the last input may carry a trailing separator artifact
    if len(inputs) == len(outputs) + 1 and inputs[-1] in ("", "\n"):
        inputs = inputs[:-1]
    assert len(inputs) == len(outputs), f"{len(inputs)} vs {len(outputs)}"
    return list(zip(inputs, outputs))


@pytest.mark.parametrize("name,kind", CASES, ids=[c[0] for c in CASES])
def test_tokenizer_golden(name, kind):
    gguf = os.path.join(FIXDIR, name + ".gguf")
    if not os.path.exists(gguf):
        pytest.skip(f"fixture {gguf} not present")
    m = GGUFModel.open(gguf)
    tok = Tokenizer.from_gguf(m)
    failures = []
    for text, want in _load_vectors(gguf):
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != want:
            failures.append((text, want, got))
    assert not failures, "\n".join(
        f"input {t!r}:\n  want {w}\n  got  {g}" for t, w, g in failures[:8]
    )


def test_spm_roundtrip():
    gguf = os.path.join(FIXDIR, "ggml-vocab-llama-spm.gguf")
    if not os.path.exists(gguf):
        pytest.skip("fixture not present")
    tok = Tokenizer.from_gguf(GGUFModel.open(gguf))
    for text in ("Hello world", "  leading spaces", "emoji 🙂 test", "tab\tnewline\n"):
        ids = tok.encode(text, add_special=False)
        assert tok.decode(ids) == text


def test_bpe_roundtrip_and_specials():
    gguf = os.path.join(FIXDIR, "ggml-vocab-gpt-2.gguf")
    if not os.path.exists(gguf):
        pytest.skip("fixture not present")
    tok = Tokenizer.from_gguf(GGUFModel.open(gguf))
    for text in ("Hello world", "  leading", "Ünïcödé!"):
        ids = tok.encode(text, add_special=False)
        assert tok.decode(ids) == text
