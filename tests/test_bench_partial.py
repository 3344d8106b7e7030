"""bench.py incremental persistence (VERDICT r4 weak #1): every row is
flushed to disk as it completes, and the final JSON merges the current run
with the last-good file so a tunnel flake never yields value 0.0 when a
previous capture exists."""

import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_partial_store_flush_and_reload(tmp_path):
    bench = _bench()
    p = str(tmp_path / "partial.json")
    s = bench.PartialStore(path=p)
    s.update({"metric": "m", "value": 80.0, "unit": "tok/s",
              "vs_baseline": 1.2})
    s.set_row("qwen25_14b", {"value": 44.0, "vs_baseline": 1.01})
    on_disk = json.load(open(p))
    assert on_disk["value"] == 80.0
    assert on_disk["rows"]["qwen25_14b"]["value"] == 44.0

    # a later run that captures nothing merges the last-good file, stale
    s2 = bench.PartialStore(path=p)
    out = s2.merged_final(error="tunnel down")
    assert out["value"] == 80.0
    assert out["stale"] is True
    assert out["error"] == "tunnel down"
    assert out["rows"]["qwen25_14b"]["value"] == 44.0
    assert out["rows"]["qwen25_14b"]["stale"] is True


def test_partial_store_fresh_rows_win(tmp_path):
    bench = _bench()
    p = str(tmp_path / "partial.json")
    s = bench.PartialStore(path=p)
    s.update({"metric": "m", "value": 80.0})
    s.set_row("qwen25_14b", {"value": 44.0})
    s.set_row("engine", {"value": 70.0})

    s2 = bench.PartialStore(path=p)
    s2.update({"metric": "m", "value": 85.0})
    s2.set_row("qwen25_14b", {"value": 46.0})          # fresh: wins
    s2.set_row("engine", {"skipped": "budget"})        # failed: stale fill
    out = s2.merged_final()
    assert out["value"] == 85.0 and "stale" not in out
    assert out["rows"]["qwen25_14b"] == {"value": 46.0}
    assert out["rows"]["engine"]["value"] == 70.0
    assert out["rows"]["engine"]["stale"] is True
    assert out["rows"]["engine"]["skip_reason_now"] == "budget"


def test_partial_store_disabled_never_touches_disk(tmp_path):
    bench = _bench()
    p = str(tmp_path / "partial.json")
    json.dump({"value": 99.0, "rows": {}}, open(p, "w"))
    s = bench.PartialStore(path=p, enabled=False)
    s.update({"metric": "tiny", "value": 1.0})
    s.set_row("r", {"value": 2.0})
    # file untouched, no prev merge
    assert json.load(open(p))["value"] == 99.0
    out = s.merged_final()
    assert out["value"] == 1.0 and "stale" not in out
