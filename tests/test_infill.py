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
    bos = m.tokenizer.vocab.bos_id
    assert toks[0] == bos  # BOS leads the infill prompt (infill.cpp:210)
    assert toks[1] == pre and toks[-1] == mid and suf in toks
    # PSM: prefix body comes before the suffix marker
    i_suf = toks.index(suf)
    assert i_suf > 2
    spm = build_infill_prompt(m.tokenizer, "ab", "cd", spm_infill=True)
    assert spm[0] == bos and spm[1] == suf and spm[-1] == mid and pre in spm
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


def test_fim_kv_ids_preferred(tmp_path):
    """Explicit tokenizer.ggml.prefix/suffix/middle_token_id KVs win over
    name probing (codellama GGUFs carry SPM pieces like '▁<PRE>' that the
    name table can't always see)."""
    from prima_tpu.models.loader import load_model
    from prima_tpu.tokenizer.fim import detect_fim_tokens

    path = str(tmp_path / "kvfim.gguf")
    make_tiny_gguf(path, seed=3, extra_tokens=["▁<PRE>", "▁<SUF>", "▁<MID>"])
    m = load_model(path)
    ids = detect_fim_tokens(m.tokenizer.vocab)
    assert ids is not None  # the ▁-escaped codellama family is probed
    # explicit KVs take precedence when present
    v = m.tokenizer.vocab
    v.fim_pre_id, v.fim_suf_id, v.fim_mid_id = 7, 8, 9
    assert detect_fim_tokens(v) == (7, 8, 9)
