"""FIM/infill: token detection, prompt assembly (PSM/SPM), CLI tool
(reference examples/infill/infill.cpp + server /infill)."""

import io
import sys

import pytest

from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf

FIM = ["<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>"]


@pytest.fixture(scope="module")
def fim_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "fim.gguf")
    return make_tiny_gguf(path, seed=3, extra_tokens=FIM)


def test_detect_and_build(fim_model):
    from prima_tpu.models.loader import load_model
    from prima_tpu.tokenizer.fim import build_infill_prompt, detect_fim_tokens

    m = load_model(fim_model)
    fim = detect_fim_tokens(m.tokenizer.vocab)
    assert fim is not None
    pre, suf, mid = fim
    toks = build_infill_prompt(m.tokenizer, "ab", "cd")
    assert toks[0] == pre and toks[-1] == mid and suf in toks
    # PSM: prefix body comes before the suffix marker
    i_suf = toks.index(suf)
    assert i_suf > 1
    spm = build_infill_prompt(m.tokenizer, "ab", "cd", spm_infill=True)
    assert spm[0] == suf and spm[-1] == mid and pre in spm
    assert sorted(spm) == sorted(toks)  # same tokens, different order


def test_no_fim_tokens_raises(tmp_path):
    from prima_tpu.models.loader import load_model
    from prima_tpu.tokenizer.fim import build_infill_prompt

    path = str(tmp_path / "plain.gguf")
    make_tiny_gguf(path, seed=3, vocab_from=None)
    m = load_model(path)
    with pytest.raises(ValueError):
        build_infill_prompt(m.tokenizer, "a", "b")


def test_infill_tool_e2e(fim_model):
    from prima_tpu.tools.infill import main

    old = sys.stdout
    sys.stdout = cap = io.StringIO()
    try:
        rc = main(["-m", fim_model, "--in-prefix", "def f():",
                   "--in-suffix", "return x", "-n", "6", "--temp", "0",
                   "--matmul", "xla", "-c", "128"])
    finally:
        sys.stdout = old
    assert rc == 0
    out = cap.getvalue()
    assert out.startswith("def f():") and out.rstrip().endswith("return x")


def test_infill_tool_rejects_plain_model(tmp_path, capsys):
    from prima_tpu.tools.infill import main

    path = str(tmp_path / "plain.gguf")
    make_tiny_gguf(path, seed=3, vocab_from=None)
    assert main(["-m", path, "--matmul", "xla"]) == 1
    assert "no FIM" in capsys.readouterr().err
