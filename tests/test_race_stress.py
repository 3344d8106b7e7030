"""Thread-race stress tier for the threaded server scheduler.

The reference forwards TSan/ASan into its C++ build (CMakeLists.txt:60-82);
the native C++ here gets the same treatment via `make native-tsan/asan`.
This file covers the PYTHON threaded surface (EngineWorker: HTTP threads
submitting/cancelling against the engine loop) the way race hunters do in
pure Python: shrink sys.setswitchinterval to force preemption at every
bytecode boundary and hammer submit/cancel/metrics/run() from many threads,
asserting the scheduler neither corrupts request state nor deadlocks.
"""

import sys
import threading
import time

import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import synth_params
from prima_tpu.runtime.engine import Engine
from prima_tpu.sampling import Sampler, SamplerParams
from prima_tpu.server.scheduler import EngineWorker, GenerationRequest

pytestmark = pytest.mark.slow  # multi-thread stress tier (ci/run.sh)


class _IdTok:
    """Minimal tokenizer for the worker's detokenize path."""

    eog_ids = frozenset()

    def decode_token_bytes(self, t: int) -> bytes:
        return f"<{t}>".encode()


@pytest.fixture()
def worker():
    cfg = tiny_config(n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                      head_dim=16, n_ff=128, n_vocab=97)
    eng = Engine(cfg, synth_params(cfg, GGMLType.Q8_0), n_slots=4,
                 max_seq=64, n_batch=16)
    w = EngineWorker(eng, _IdTok())
    w.start()
    yield w
    w.shutdown()


def test_concurrent_submit_cancel_stress(worker):
    old = sys.getswitchinterval()
    sys.setswitchinterval(1e-6)  # preempt at every opportunity
    try:
        results = []
        errors = []

        def client(i):
            try:
                req = GenerationRequest(
                    prompt_tokens=[3 + i % 7, 11, 5],
                    sampler=Sampler(SamplerParams(temp=0.8, top_k=8,
                                                  seed=i)),
                    n_predict=6)
                worker.submit(req)
                if i % 3 == 0:
                    # racing cancel against generation
                    time.sleep(0.001 * (i % 5))
                    worker.cancel(req.request_id)
                got = 0
                deadline = time.time() + 60
                while time.time() < deadline:
                    try:
                        ev = req.events.get(timeout=60)
                    except Exception:
                        break
                    if ev.done:
                        results.append((i, got, ev.reason))
                        return
                    got += 1
                errors.append((i, "no-done-event"))
            except Exception as e:  # noqa: BLE001
                errors.append((i, repr(e)))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(24)]
        # plus a thread hammering the safe-point control channel
        stop = threading.Event()

        def control():
            while not stop.is_set():
                worker.run(lambda: worker.metrics["n_requests"])
                time.sleep(0.002)

        ct = threading.Thread(target=control)
        ct.start()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        stop.set()
        ct.join(timeout=30)

        assert not errors, errors
        assert len(results) == 24
        # every non-cancelled request finished with a real reason
        for i, got, reason in results:
            assert reason in ("length", "eog", "stop", "cancelled",
                              "context_full"), (i, reason)
        # no request left active; slots all recycled
        assert worker.active == {}
        assert all(s.state.name == "IDLE" for s in worker.engine.slots)
    finally:
        sys.setswitchinterval(old)


def test_shutdown_under_load(worker):
    for i in range(8):
        worker.submit(GenerationRequest(
            prompt_tokens=[5, 6, 7],
            sampler=Sampler(SamplerParams(temp=0.0)), n_predict=50))
    worker.shutdown()  # must not hang with pending + active work
    assert not worker.thread.is_alive()
