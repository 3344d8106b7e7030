"""prima-bench matrix tool: output formats + timing sanity."""

import json

import pytest

from prima_tpu.tools.bench_tool import main
from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    return make_tiny_gguf(path, seed=3)


def test_bench_tool_json(tiny_gguf, capsys):
    rc = main(["-m", str(tiny_gguf), "-p", "16", "-n", "4", "-b", "1",
               "-r", "2", "-c", "64", "-o", "json"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    tests = {r["test"] for r in rows}
    assert tests == {"pp16", "tg4"}
    for r in rows:
        assert r["avg_ts"] > 0
        assert r["stddev_ts"] >= 0
        assert r["n_batch"] == 1


def test_bench_tool_markdown_and_csv(tiny_gguf, capsys):
    rc = main(["-m", str(tiny_gguf), "-p", "0", "-n", "4", "-b", "1,2",
               "-r", "1", "-c", "64", "-o", "md"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("| model |")
    assert "tg4" in out and out.count("\n") >= 3  # header + sep + 2 rows

    rc = main(["-m", str(tiny_gguf), "-p", "8", "-n", "0", "-b", "1",
               "-r", "1", "-c", "64", "-o", "csv"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0].startswith("model,")
    assert "pp8" in out
