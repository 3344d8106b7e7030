"""prima-parallel (examples/parallel) and prima-embedding
(examples/embedding) CLI analogues."""

import io
import json
import sys

import numpy as np
import pytest

from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    return make_tiny_gguf(path, seed=3)


def _run(fn, args):
    old = sys.stdout
    sys.stdout = cap = io.StringIO()
    try:
        rc = fn(args)
    finally:
        sys.stdout = old
    assert rc == 0
    return cap.getvalue()


def test_parallel_serves_all_sequences(tiny_model, capsys):
    from prima_tpu.tools.parallel import main

    out = _run(main, ["-m", tiny_model, "-np", "2", "-ns", "5", "-n", "6",
                      "--matmul", "xla", "--temp", "0", "-c", "128"])
    # every sequence produced a completed line with a stop reason
    for seq in range(5):
        assert f"[seq {seq:3d}]" in out
    assert out.count("tok,") == 5
    err = capsys.readouterr().err
    assert "n_parallel = 2, n_sequences = 5" in err


def test_parallel_batches_decodes(tiny_model, capsys):
    """Continuous batching: 4 clients x 6 tokens must take far fewer decode
    calls than 24 (the whole point of examples/parallel)."""
    from prima_tpu.tools.parallel import main

    _run(main, ["-m", tiny_model, "-np", "4", "-ns", "4", "-n", "6",
                "--matmul", "xla", "--temp", "0", "-c", "128",
                "--no-system"])
    err = capsys.readouterr().err
    calls = int(err.split("decode calls")[0].rsplit(",", 1)[-1].strip())
    assert calls <= 12  # 4 slots decode together: ~6 calls + prefill ticks


def test_embedding_json_and_similarity(tiny_model):
    from prima_tpu.tools.embedding import main

    out = _run(main, ["-m", tiny_model, "-p", "hello world\\ngoodbye moon",
                      "--embd-output-format", "json+", "--matmul", "xla",
                      "-c", "64"])
    doc = json.loads(out)
    assert len(doc["data"]) == 2
    v0 = np.asarray(doc["data"][0]["embedding"])
    assert np.isfinite(v0).all() and abs(np.linalg.norm(v0) - 1.0) < 1e-3
    sim = doc["cosineSimilarity"]
    assert len(sim) == 2 and abs(sim[0][0] - 1.0) < 0.02


def test_embedding_default_matrix_output(tiny_model):
    from prima_tpu.tools.embedding import main

    out = _run(main, ["-m", tiny_model, "-p", "a b\\nc d", "--matmul", "xla",
                      "-c", "64"])
    assert "embedding 0:" in out and "cosine similarity matrix" in out


def test_normalize_modes():
    from prima_tpu.tools.embedding import normalize_embedding

    v = np.asarray([3.0, -4.0], np.float32)
    assert np.allclose(normalize_embedding(v, 2), [0.6, -0.8])
    assert np.allclose(normalize_embedding(v, -1), v)
    t = normalize_embedding(v, 1)  # taxicab
    assert np.allclose(np.abs(t).sum(), 1.0)
    m = normalize_embedding(v, 0)  # max-abs int16 scaling
    assert np.abs(m).max() == pytest.approx(32760.0, rel=1e-3)


def test_batched_tool(tiny_model, capsys):
    """prima-batched (examples/batched): N forked continuations, shared
    prompt decoded once via prefix reuse."""
    import io

    from prima_tpu.tools.batched import main

    old = sys.stdout
    sys.stdout = cap = io.StringIO()
    try:
        rc = main(["-m", tiny_model, "-p", "Hello", "-np", "3", "-n", "6",
                   "--matmul", "xla", "-c", "128", "--temp", "0.8"])
    finally:
        sys.stdout = old
    assert rc == 0
    out = cap.getvalue()
    assert out.count("sequence ") == 3
    err = capsys.readouterr().err
    calls = int(err.split("decode calls")[0].rsplit("(", 1)[-1].strip())
    assert calls <= 10  # 3 slots batched: ~6 decode ticks, not 18


def test_engine_fork_shares_prefill(tiny_model):
    """Engine.fork: the forked slot continues from the source's KV without
    re-prefilling, and greedy forks decode identically."""
    import jax.numpy as jnp

    from prima_tpu.models.llama import ForwardOptions
    from prima_tpu.models.loader import load_model
    from prima_tpu.runtime.engine import Engine

    m = load_model(tiny_model)
    eng = Engine(m.cfg, m.params, n_slots=3, max_seq=128, n_batch=32,
                 opts=ForwardOptions(matmul_impl="xla", dtype=jnp.float32))
    toks = m.tokenizer.encode("Hello world", add_special=True)
    first = eng.submit(toks, n_predict=8, request_id=0)
    eng.prefill_only(first)
    prefill_tokens = eng.perf["n_prompt"]
    eng.fork(first, n_predict=8, request_id=1)
    eng.fork(first, n_predict=8, request_id=2)
    assert eng.perf["n_prompt"] == prefill_tokens  # no extra prefill

    out = {0: [], 1: [], 2: []}
    live = {0, 1, 2}
    while live:
        events = eng.step()
        if not events:
            break
        for ev in events:
            if ev.token is not None:
                out[ev.request_id].append(ev.token)
            if ev.done:
                live.discard(ev.request_id)
    assert out[0] == out[1] == out[2]  # greedy forks are identical
    assert len(out[0]) == 8
