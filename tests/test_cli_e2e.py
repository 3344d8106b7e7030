"""End-to-end: synth GGUF -> loader -> engine -> CLI (the ci/run.sh analogue)."""

import io
import json
import sys

import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf

pytestmark = pytest.mark.slow  # multi-process/e2e tier (ci/run.sh --runslow)


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    return make_tiny_gguf(path, seed=3)


def _run_cli(args):
    from prima_tpu.tools.cli import main

    old = sys.stdout
    sys.stdout = cap = io.StringIO()
    try:
        rc = main(args)
    finally:
        sys.stdout = old
    assert rc == 0
    return cap.getvalue()


def test_cli_greedy_deterministic(tiny_model):
    out1 = _run_cli(["-m", tiny_model, "-p", "Hello", "-n", "6", "--temp", "0",
                     "--matmul", "xla", "--no-display-prompt"])
    out2 = _run_cli(["-m", tiny_model, "-p", "Hello", "-n", "6", "--temp", "0",
                     "--matmul", "xla", "--no-display-prompt"])
    assert out1 == out2
    assert len(out1.strip()) > 0


def test_cli_json_schema_constrained(tiny_model):
    schema = '{"type":"object","properties":{"a":{"type":"integer"}},"required":["a"]}'
    out = _run_cli(["-m", tiny_model, "-p", "x", "-n", "48", "--temp", "0.7",
                    "-s", "11", "--matmul", "xla", "--no-display-prompt",
                    "--json-schema", schema])
    obj = json.loads(out.strip())
    assert "a" in obj and isinstance(obj["a"], int)


def test_cli_seeded_sampling_reproducible(tiny_model):
    args = ["-m", tiny_model, "-p", "ab", "-n", "8", "--temp", "1.0", "-s", "7",
            "--matmul", "xla", "--no-display-prompt"]
    assert _run_cli(args) == _run_cli(args)


def test_loader_roundtrip(tiny_model):
    from prima_tpu.models.loader import load_model

    m = load_model(tiny_model)
    assert m.cfg.n_layers == 2
    assert m.cfg.n_vocab == m.tokenizer.vocab.n_tokens
    ids = m.tokenizer.encode("hello world")
    assert m.tokenizer.decode(ids) == "hello world"


def test_cli_prompt_cache_roundtrip(tiny_model, tmp_path):
    """--prompt-cache: first run saves the session; the second restores it
    and produces identical greedy output (main.cpp:268-288 behavior)."""
    cache = str(tmp_path / "session.bin")
    args = ["-m", tiny_model, "-p", "Hello world", "-n", "6", "--temp", "0",
            "--matmul", "xla", "--no-display-prompt", "--prompt-cache", cache]
    out1 = _run_cli(args)
    import os

    assert os.path.exists(cache) and os.path.getsize(cache) > 0
    out2 = _run_cli(args)
    assert out2 == out1
    # read-only mode leaves the file untouched
    mtime = os.path.getmtime(cache)
    _run_cli(args + ["--prompt-cache-ro"])
    assert os.path.getmtime(cache) == mtime


def test_cli_speculative_matches_plain(tiny_model):
    """-md draft: lossless speculation — greedy output identical to plain."""
    plain = _run_cli(["-m", tiny_model, "-p", "Hello", "-n", "8", "--temp", "0",
                      "--matmul", "xla", "--no-display-prompt"])
    spec = _run_cli(["-m", tiny_model, "-md", tiny_model, "-p", "Hello",
                     "-n", "8", "--temp", "0", "--matmul", "xla",
                     "--no-display-prompt", "--draft-max", "4"])
    assert spec.strip() == plain.strip()


def test_speculative_tool(tiny_model, capsys):
    from prima_tpu.tools.speculative import main as spec_main

    rc = spec_main(["-m", tiny_model, "-md", tiny_model, "-p", "Hi",
                    "-n", "6", "--matmul", "xla", "--temp", "0"])
    assert rc == 0
    cap = capsys.readouterr()
    assert "accept rate" in cap.err
    assert len(cap.out.strip()) > len("Hi")


def test_cli_conversation_mode(tiny_model, monkeypatch):
    """-cnv renders each turn with the chat template (main.cpp chat flow);
    two turns must run through the engine's prefix-reuse path."""
    turns = iter(["Hi there", "And again?", ""])
    monkeypatch.setattr("builtins.input", lambda *_: next(turns))
    out = _run_cli(["-m", tiny_model, "-n", "4", "--temp", "0",
                    "--matmul", "xla", "-cnv", "-p", "You are helpful.",
                    "--chat-template", "chatml"])
    # two assistant replies were generated
    assert len(out.strip()) > 0


def test_cli_single_process_streamed(tiny_model):
    """-ngl on one process routes through the degenerate ring: N layers per
    window resident, the rest streamed host->HBM; greedy output must match
    the fully-resident path."""
    ref = _run_cli(["-m", tiny_model, "-p", "Hello", "-n", "6", "--temp", "0",
                    "--matmul", "xla", "--no-display-prompt"])
    out = _run_cli(["-m", tiny_model, "-p", "Hello", "-n", "6", "--temp", "0",
                    "--matmul", "xla", "--no-display-prompt",
                    "-ngl", "0", "-lw", "1", "-k", "2",
                    "--data-port", "23941"])
    assert out.strip() == ref.strip()


def test_override_kv(tiny_model, capsys):
    """--override-kv patches GGUF metadata before config parse
    (common/arg.cpp:1652 string_parse_kv_override semantics)."""
    from prima_tpu.models.loader import load_model, parse_kv_override

    assert parse_kv_override("llama.context_length=int:64") == \
        ("llama.context_length", 64)
    assert parse_kv_override("tokenizer.ggml.add_bos_token=bool:false") == \
        ("tokenizer.ggml.add_bos_token", False)
    assert parse_kv_override("llama.rope.freq_base=float:500000.0") == \
        ("llama.rope.freq_base", 500000.0)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_kv_override("key=weird:1")
    with _pytest.raises(ValueError):
        parse_kv_override("no-type-here")

    m = load_model(tiny_model,
                   kv_overrides={"llama.rope.freq_base": 123.0,
                                 "llama.context_length": 99})
    assert m.cfg.rope_base == 123.0
    assert m.cfg.n_ctx_train == 99

    # end to end through the CLI flag
    out = _run_cli(["-m", tiny_model, "-p", "Hi", "-n", "4", "--temp", "0",
                    "--matmul", "xla", "--no-display-prompt",
                    "--override-kv", "llama.rope.freq_base=float:123.0"])
    assert len(out.strip()) > 0


def test_save_load_state_tool(tiny_model, capsys):
    from prima_tpu.tools.save_load_state import main

    rc = main(["-m", tiny_model, "-n", "12", "-s", "7", "--matmul", "xla"])
    out = capsys.readouterr().out
    assert rc == 0
    runs = [l.split(": ", 1)[1] for l in out.splitlines() if ": " in l]
    assert len(runs) == 4 and len(set(runs)) == 1
