"""Server integration tests — the analogue of the reference's behave suites
(examples/server/tests/features/*): a real HTTP server on a tiny model,
exercising endpoints, streaming, concurrency, cancellation, slot save."""

import http.client
import json
import threading
import time

import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.llama import ForwardOptions
from prima_tpu.models.loader import load_model
from prima_tpu.runtime.engine import Engine
from prima_tpu.server.app import serve
from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf

pytestmark = pytest.mark.slow  # multi-process/e2e tier (ci/run.sh --runslow)

OPTS = ForwardOptions(matmul_impl="xla")


@pytest.fixture(scope="module", params=["single", "dist"])
def server(request, tmp_path_factory):
    """Every endpoint test runs twice: against the single-chip Engine and
    against the mesh DistributedEngine (VERDICT r1 item 3 — the reference's
    server drives the distributed ring, server.cpp:2431)."""
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path, seed=3)
    model = load_model(path)
    if request.param == "single":
        engine = Engine(model.cfg, model.params, n_slots=2, max_seq=256,
                        n_batch=64, opts=OPTS, eog_ids=model.eog_ids)
    else:
        import functools

        from prima_tpu.gguf.reader import GGUFModel
        from prima_tpu.models.llama import gguf_host_head, gguf_host_layer
        from prima_tpu.parallel.engine import DistributedEngine
        from prima_tpu.parallel.mesh import make_mesh
        from prima_tpu.parallel.pipeline import PipeSpec, build_pipe_model

        m = GGUFModel.open(path)
        cfg = model.cfg
        # tp=1: the tiny model's K=256 is one Q4_K superblock, too small to
        # column-shard (tp paths are covered by test_parallel.py)
        mesh = make_mesh(dp=1, pp=2, tp=1)
        spec = PipeSpec.for_model(cfg, n_pp=2, n_tp=1, n_dp=1, k_cycles=1,
                                  microbatches=2)
        params = build_pipe_model(
            functools.partial(gguf_host_layer, m, cfg),
            gguf_host_head(m, cfg), cfg, spec, mesh, pallas=False)
        engine = DistributedEngine(cfg, params, spec, mesh,
                                   batch_per_micro=1, max_seq=256,
                                   n_batch=64, opts=OPTS,
                                   eog_ids=model.eog_ids)
    httpd, ctx = serve(model, engine, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port, ctx
    httpd.shutdown()
    ctx.worker.shutdown()


def _req(port, method, path, body=None, timeout=300):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request(method, path, json.dumps(body) if body is not None else None,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_health_props_models_metrics(server):
    port, _ = server
    st, data = _req(port, "GET", "/health")
    assert st == 200 and json.loads(data)["status"] == "ok"
    st, data = _req(port, "GET", "/props")
    props = json.loads(data)
    assert st == 200 and props["total_slots"] == 2
    st, data = _req(port, "GET", "/v1/models")
    assert st == 200 and json.loads(data)["data"][0]["object"] == "model"
    st, data = _req(port, "GET", "/metrics")
    assert st == 200 and b"llamacpp:prompt_tokens_total" in data


def test_completion_non_streaming(server):
    port, _ = server
    st, data = _req(port, "POST", "/v1/completions",
                    {"prompt": "Hello", "max_tokens": 6, "temperature": 0})
    assert st == 200
    out = json.loads(data)
    assert out["object"] == "text_completion"
    assert len(out["choices"][0]["text"]) > 0
    assert out["choices"][0]["finish_reason"] in ("stop", "length")


def test_completion_deterministic(server):
    port, _ = server
    body = {"prompt": "abc", "max_tokens": 5, "temperature": 0}
    _, d1 = _req(port, "POST", "/v1/completions", body)
    _, d2 = _req(port, "POST", "/v1/completions", body)
    assert json.loads(d1)["choices"][0]["text"] == json.loads(d2)["choices"][0]["text"]


def test_chat_completion(server):
    port, _ = server
    st, data = _req(port, "POST", "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "Hi"}],
                     "max_tokens": 5, "temperature": 0})
    assert st == 200
    out = json.loads(data)
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_streaming_sse(server):
    port, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/v1/completions",
                 json.dumps({"prompt": "xy", "max_tokens": 4, "temperature": 0,
                             "stream": True}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert "text/event-stream" in resp.getheader("Content-Type", "")
    raw = resp.read().decode()
    conn.close()
    events = [l[6:] for l in raw.splitlines() if l.startswith("data: ")]
    assert events[-1] == "[DONE]"
    payloads = [json.loads(e) for e in events[:-1]]
    text = "".join(p["choices"][0]["text"] for p in payloads)
    assert len(text) > 0
    assert payloads[-1]["choices"][0]["finish_reason"] in ("stop", "length")


def test_concurrent_requests(server):
    port, _ = server
    results = {}

    def go(name, prompt):
        st, data = _req(port, "POST", "/v1/completions",
                        {"prompt": prompt, "max_tokens": 8, "temperature": 0})
        results[name] = (st, json.loads(data)["choices"][0]["text"])

    threads = [threading.Thread(target=go, args=(f"r{i}", p))
               for i, p in enumerate(["alpha", "beta", "gamma"])]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 3 and all(st == 200 for st, _ in results.values())
    # same prompts solo must give same text (batching doesn't corrupt)
    _, d = _req(port, "POST", "/v1/completions",
                {"prompt": "beta", "max_tokens": 8, "temperature": 0})
    assert json.loads(d)["choices"][0]["text"] == results["r1"][1]


def test_stop_strings(server):
    port, _ = server
    _, d0 = _req(port, "POST", "/v1/completions",
                 {"prompt": "q", "max_tokens": 12, "temperature": 0})
    full = json.loads(d0)["choices"][0]["text"]
    if len(full) > 4:
        stop = full[2:4]
        _, d1 = _req(port, "POST", "/v1/completions",
                     {"prompt": "q", "max_tokens": 12, "temperature": 0, "stop": [stop]})
        out = json.loads(d1)["choices"][0]["text"]
        assert stop not in out
        assert full.startswith(out)


def test_embeddings(server):
    port, _ = server
    st, data = _req(port, "POST", "/v1/embeddings", {"input": ["hello", "world"]})
    assert st == 200
    out = json.loads(data)
    assert len(out["data"]) == 2
    assert len(out["data"][0]["embedding"]) == 256  # n_embd


def test_tokenize_detokenize(server):
    port, _ = server
    st, data = _req(port, "POST", "/tokenize", {"content": "hello world"})
    ids = json.loads(data)["tokens"]
    assert st == 200 and len(ids) > 0
    st, data = _req(port, "POST", "/detokenize", {"tokens": ids})
    assert json.loads(data)["content"] == "hello world"


def test_cancel_endpoint(server):
    port, ctx = server
    # cancel a long-running streamed task mid-flight
    task_ids = {}

    def run():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/v1/completions",
                     json.dumps({"prompt": "z", "max_tokens": 150, "temperature": 0,
                                 "stream": True}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        buf = b""
        while True:
            chunk = resp.read(200)
            if not chunk:
                break
            buf += chunk
            *complete, _tail = buf.decode(errors="ignore").split("\n")
            for line in complete:
                if line.startswith("data: {") and "task_id" in line:
                    try:
                        task_ids["id"] = json.loads(line[6:]).get("task_id")
                    except json.JSONDecodeError:
                        pass
        conn.close()

    t = threading.Thread(target=run)
    t.start()
    deadline = time.time() + 60
    while "id" not in task_ids and time.time() < deadline:
        time.sleep(0.05)
    assert "id" in task_ids
    st, data = _req(port, "POST", "/v1/cancel", {"task_id": task_ids["id"]})
    # request may have been admitted: cancellation should succeed or the
    # request already finished (404)
    assert st in (200, 404)
    t.join(timeout=120)
    assert not t.is_alive()


def test_slot_save_restore(server, tmp_path):
    port, ctx = server
    _req(port, "POST", "/v1/completions", {"prompt": "persist me", "max_tokens": 3,
                                           "temperature": 0})
    st, data = _req(port, "POST", "/slots/0?action=save",
                    {"filename": str(tmp_path / "s0.npz")})
    assert st == 200 and json.loads(data)["n_saved"] >= 0
    st, data = _req(port, "POST", "/slots/0?action=erase")
    assert st == 200
    st, data = _req(port, "POST", "/slots/0?action=restore",
                    {"filename": str(tmp_path / "s0.npz")})
    assert st == 200
    assert json.loads(data)["n_restored"] == json.loads(_req(port, "GET", "/slots")[1])[0]["n_past"]


def test_rerank(server):
    port, _ = server
    st, data = _req(port, "POST", "/v1/rerank",
                    {"query": "hello world", "documents": ["hello world", "xyzzy"]})
    assert st == 200
    out = json.loads(data)
    assert len(out["results"]) == 2
    # identical text should rank first
    assert out["results"][0]["index"] == 0
    assert out["results"][0]["relevance_score"] >= out["results"][1]["relevance_score"]


def test_infill_without_fim_tokens(server):
    port, _ = server
    st, data = _req(port, "POST", "/infill",
                    {"input_prefix": "def f(", "input_suffix": "): pass"})
    assert st == 501  # tiny model's vocab has no FIM tokens
    assert "FIM" in json.loads(data)["error"]["message"]


def test_unknown_endpoint_404(server):
    port, _ = server
    st, _ = _req(port, "GET", "/nope")
    assert st == 404
    st, _ = _req(port, "POST", "/nope", {})
    assert st == 404


def test_completion_logprobs(server):
    port, _ = server
    st, data = _req(port, "POST", "/v1/completions",
                    {"prompt": "ab", "max_tokens": 3, "temperature": 0,
                     "logprobs": 3})
    assert st == 200
    lp = json.loads(data)["choices"][0].get("logprobs")
    assert lp is not None
    assert len(lp["tokens"]) == len(lp["token_logprobs"]) == len(lp["top_logprobs"])
    assert len(lp["tokens"]) >= 1
    assert all(isinstance(v, float) and v <= 0 for v in lp["token_logprobs"])
    assert all(len(d) >= 3 for d in lp["top_logprobs"])


def test_webui_index(server):
    port, _ = server
    st, data = _req(port, "GET", "/")
    assert st == 200 and b"<!doctype html>" in data and b"/v1/chat/completions" in data


def test_lora_adapters_endpoints(tmp_path_factory):
    """/lora-adapters list + hot rescaling (server.cpp:3429-3473 semantics)."""
    import numpy as np

    from prima_tpu.gguf.writer import GGUFWriter
    from prima_tpu.models.adapters import load_lora_gguf

    d = tmp_path_factory.mktemp("lora_srv")
    path = str(d / "tiny.gguf")
    make_tiny_gguf(path, seed=5)
    model = load_model(path)

    lpath = str(d / "adapter.gguf")
    rng = np.random.default_rng(0)
    w = GGUFWriter(lpath, arch="llama")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", 8.0)
    cfg = model.cfg
    a = (rng.standard_normal((4, cfg.n_embd)) * 0.05).astype(np.float32)
    b = (rng.standard_normal((cfg.n_heads * cfg.head_dim, 4)) * 0.05).astype(np.float32)
    w.add_tensor("blk.0.attn_q.weight.lora_a", a)
    w.add_tensor("blk.0.attn_q.weight.lora_b", b)
    w.write()

    engine = Engine(model.cfg, model.params, n_slots=2, max_seq=128, n_batch=32,
                    opts=OPTS, eog_ids=model.eog_ids)
    loras = [{"id": 0, "path": lpath, "scale": 0.5,
              "data": load_lora_gguf(lpath, scale=1.0)}]
    httpd, ctx = serve(model, engine, "127.0.0.1", 0, loras=loras)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        ctx.set_lora_scales([{"id": 0, "scale": 0.5}])
        st, data = _req(port, "GET", "/lora-adapters")
        lst = json.loads(data)
        assert st == 200 and lst == [{"id": 0, "path": lpath, "scale": 0.5}]

        def completion():
            st, data = _req(port, "POST", "/v1/completions", {
                "prompt": "ab", "max_tokens": 4, "temperature": 0.0, "seed": 1,
            })
            assert st == 200
            return json.loads(data)["choices"][0]["text"]

        out_scaled = completion()

        # rescale to 0 == base model output
        st, data = _req(port, "POST", "/lora-adapters", [])
        assert st == 200 and json.loads(data)["success"]
        st, data = _req(port, "GET", "/lora-adapters")
        assert json.loads(data)[0]["scale"] == 0.0
        out_base = completion()

        # back to a strong scale: output changes relative to base
        st, _ = _req(port, "POST", "/lora-adapters", [{"id": 0, "scale": 8.0}])
        assert st == 200
        out_strong = completion()
        assert out_strong != out_base or out_scaled != out_base

        # invalid id is an error
        st, _ = _req(port, "POST", "/lora-adapters", [{"id": 7, "scale": 1.0}])
        assert st == 400
    finally:
        httpd.shutdown()
        ctx.worker.shutdown()


def test_server_speculative_mode(tmp_path_factory):
    """--model-draft serving: greedy output identical to the plain engine,
    streamed per verify round."""
    from prima_tpu.runtime.speculative import SpeculativeDecoder

    d = tmp_path_factory.mktemp("spec_srv")
    path = str(d / "tiny.gguf")
    make_tiny_gguf(path, seed=7)
    model = load_model(path)

    def mk_engine():
        return Engine(model.cfg, model.params, n_slots=2, max_seq=128,
                      n_batch=32, opts=OPTS, eog_ids=model.eog_ids)

    # plain reference output
    plain_engine = mk_engine()
    httpd, ctx = serve(model, plain_engine, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    body = {"prompt": "abc", "max_tokens": 8, "temperature": 0.0, "seed": 1}
    st, data = _req(port, "POST", "/v1/completions", body)
    assert st == 200
    plain = json.loads(data)["choices"][0]["text"]
    httpd.shutdown()
    ctx.worker.shutdown()

    # speculative server (draft = target: accepts everything)
    t_eng, d_eng = mk_engine(), mk_engine()
    spec = SpeculativeDecoder(t_eng, d_eng, n_draft=4)
    httpd, ctx = serve(model, t_eng, "127.0.0.1", 0, spec=spec)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        st, data = _req(port, "POST", "/v1/completions", body)
        assert st == 200
        spec_out = json.loads(data)["choices"][0]["text"]
        assert spec_out == plain
        # two sequential requests reuse slot 0 cleanly
        st, data = _req(port, "POST", "/v1/completions", body)
        assert st == 200 and json.loads(data)["choices"][0]["text"] == plain
    finally:
        httpd.shutdown()
        ctx.worker.shutdown()


def test_sampling_seed_consistency(server):
    """results.feature analogue: same seed -> identical sampled output;
    different seeds -> (tiny vocab, temp 1) allowed to differ; seeded
    sampling is stable across concurrent load (varying effective batch)."""
    port, _ = server
    body = {"prompt": "abc", "max_tokens": 8, "temperature": 1.0, "seed": 42}
    _, d1 = _req(port, "POST", "/v1/completions", body)
    _, d2 = _req(port, "POST", "/v1/completions", body)
    t1 = json.loads(d1)["choices"][0]["text"]
    t2 = json.loads(d2)["choices"][0]["text"]
    assert t1 == t2

    # same seed while another slot decodes concurrently (batch size varies)
    import threading

    other = threading.Thread(target=_req, args=(
        port, "POST", "/v1/completions",
        {"prompt": "zzz", "max_tokens": 16, "temperature": 1.0, "seed": 7}))
    other.start()
    try:
        _, d3 = _req(port, "POST", "/v1/completions", body)
    finally:
        other.join()
    assert json.loads(d3)["choices"][0]["text"] == t1
