"""API-key auth — the security.feature analogue (reference
examples/server/tests/features/security.feature + server.cpp
middleware_validate_api_key @2743)."""

import http.client
import json
import threading

import pytest

from prima_tpu.models.llama import ForwardOptions
from prima_tpu.models.loader import load_model
from prima_tpu.runtime.engine import Engine
from prima_tpu.server.app import serve
from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf

pytestmark = pytest.mark.slow  # multi-process/e2e tier (ci/run.sh --runslow)


@pytest.fixture(scope="module")
def auth_server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path, seed=3)
    model = load_model(path)
    engine = Engine(model.cfg, model.params, n_slots=2, max_seq=256,
                    n_batch=64, opts=ForwardOptions(matmul_impl="xla"),
                    eog_ids=model.eog_ids)
    httpd, ctx = serve(model, engine, "127.0.0.1", 0,
                       api_keys=["sk-good", "sk-other"])
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()
    ctx.worker.shutdown()


def _req(port, method, path, body=None, key=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    headers = {"Content-Type": "application/json"}
    if key is not None:
        headers["Authorization"] = f"Bearer {key}"
    conn.request(method, path, json.dumps(body) if body else None, headers)
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, json.loads(data) if data else {}


COMPLETION = {"prompt": "Hello", "n_predict": 2, "temperature": 0}


def test_protected_endpoint_rejects_missing_key(auth_server):
    status, body = _req(auth_server, "POST", "/v1/completions", COMPLETION)
    assert status == 401
    assert body["error"]["type"] == "authentication_error"


def test_protected_endpoint_rejects_wrong_key(auth_server):
    status, _ = _req(auth_server, "POST", "/v1/completions", COMPLETION,
                     key="sk-bad")
    assert status == 401
    status, _ = _req(auth_server, "POST", "/tokenize",
                     {"content": "hi"}, key="sk-bad")
    assert status == 401


def test_valid_keys_accepted(auth_server):
    for key in ("sk-good", "sk-other"):
        status, body = _req(auth_server, "POST", "/v1/completions",
                            COMPLETION, key=key)
        assert status == 200, body


def test_health_and_models_stay_public(auth_server):
    """Unprotected endpoints skip validation (the reference's TODO comment
    keeps /health and /v1/models open)."""
    status, _ = _req(auth_server, "GET", "/health")
    assert status == 200
    status, _ = _req(auth_server, "GET", "/v1/models")
    assert status == 200
    # /props IS protected
    status, _ = _req(auth_server, "GET", "/props")
    assert status == 401
    status, _ = _req(auth_server, "GET", "/props", key="sk-good")
    assert status == 200


def test_expanded_protected_endpoints(auth_server):
    """rerank, slots actions, lora-adapters and cancel are protected too
    (beyond the reference's list — they mutate state or run inference)."""
    for method, path, body in [
        ("POST", "/v1/rerank", {"query": "q", "documents": ["a"]}),
        ("POST", "/slots/0?action=erase", {}),
        ("POST", "/lora-adapters", []),
        ("POST", "/v1/cancel", {"task_id": 1}),
        ("GET", "/slots", None),
    ]:
        status, _ = _req(auth_server, method, path, body)
        assert status == 401, path
    # and they work with a key
    status, _ = _req(auth_server, "GET", "/slots", key="sk-good")
    assert status == 200
