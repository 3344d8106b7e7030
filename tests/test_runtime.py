"""Continuous-batching engine + KV sequence ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import ForwardOptions, forward, init_kv_caches, synth_params
from prima_tpu.runtime.engine import Engine, SlotState
from prima_tpu.runtime.kv import KVCache
from prima_tpu.sampling import Sampler, SamplerParams

OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    return cfg, params


def _greedy_reference(cfg, params, prompt, n_new, max_seq=64):
    """Straight-line decode loop, batch 1, no engine."""
    kv = init_kv_caches(cfg, 1, max_seq, jnp.float32)
    toks = list(prompt)
    out = []
    pos = 0
    # prefill all but last
    if len(toks) > 1:
        t = np.asarray([toks[:-1]], dtype=np.int32)
        p = np.arange(len(toks) - 1, dtype=np.int32)[None]
        _, kv = forward(params, cfg, t, p, kv, np.zeros(1, np.int32), OPTS)
        pos = len(toks) - 1
    cur = toks[-1]
    for _ in range(n_new):
        t = np.asarray([[cur]], dtype=np.int32)
        p = np.asarray([[pos]], dtype=np.int32)
        logits, kv = forward(params, cfg, t, p, kv, np.asarray([pos], np.int32), OPTS)
        cur = int(np.argmax(np.asarray(logits[0, -1])))
        out.append(cur)
        pos += 1
    return out


def test_engine_matches_reference_greedy(setup):
    cfg, params = setup
    eng = Engine(cfg, params, n_slots=2, max_seq=64, n_batch=16, opts=OPTS,
                 kv_dtype=jnp.float32)
    prompt = [3, 17, 42, 7, 99, 5]
    got = eng.run_to_completion(prompt, n_predict=8)
    want = _greedy_reference(cfg, params, prompt, 8)
    assert got == want


def test_continuous_batching_staggered(setup):
    """Two requests joining at different times produce the same tokens as
    isolated runs (slot isolation + parked-row invariant)."""
    cfg, params = setup
    eng = Engine(cfg, params, n_slots=2, max_seq=64, n_batch=16, opts=OPTS,
                 kv_dtype=jnp.float32)
    p1, p2 = [3, 17, 42, 7], [100, 20, 8, 55, 21]
    s1 = eng.submit(p1, n_predict=10, request_id="a")
    eng.step(); eng.step()  # r1 runs alone for two steps
    s2 = eng.submit(p2, n_predict=10, request_id="b")
    while s1.state != SlotState.IDLE or s2.state != SlotState.IDLE:
        eng.step()
    assert s1.generated == _greedy_reference(cfg, params, p1, 10)
    assert s2.generated == _greedy_reference(cfg, params, p2, 10)


def test_prefix_reuse(setup):
    cfg, params = setup
    eng = Engine(cfg, params, n_slots=1, max_seq=64, n_batch=16, opts=OPTS,
                 kv_dtype=jnp.float32)
    prompt = [3, 17, 42, 7, 99, 5]
    eng.run_to_completion(prompt, n_predict=4)
    # same prefix, new tail: engine should reuse the cached prefix
    prompt2 = prompt + [12]
    slot = eng.submit(prompt2, n_predict=4, request_id="x")
    assert slot.n_prompt_done >= len(prompt) - 1  # prefix reused
    while slot.state != SlotState.IDLE:
        eng.step()
    assert slot.generated == _greedy_reference(cfg, params, prompt2, 4)


def test_cancel(setup):
    cfg, params = setup
    eng = Engine(cfg, params, n_slots=1, max_seq=64, n_batch=16, opts=OPTS,
                 kv_dtype=jnp.float32)
    slot = eng.submit([1, 2, 3], n_predict=100, request_id="r1")
    eng.step()
    assert eng.cancel("r1")
    assert slot.state == SlotState.IDLE and slot.stop_reason == "cancelled"
    assert not eng.cancel("r1")  # already idle


def test_context_shift_exact_one_layer():
    """With one layer, K/V rows depend only on (token, position), so a
    context shift must reproduce exactly the cache of re-encoding the kept
    tokens at their shifted positions."""
    cfg = tiny_config(n_layers=1)
    params = synth_params(cfg, GGMLType.Q4_K, seed=9)
    T = 32
    toks = [5, 9, 2, 33, 11, 7, 21, 13]
    n_keep, n_discard = 2, 3

    kv = KVCache(cfg, 1, T, jnp.float32)
    t = np.asarray([toks], dtype=np.int32)
    p = np.arange(len(toks), dtype=np.int32)[None]
    _, kv.caches = forward(params, cfg, t, p, kv.caches, np.zeros(1, np.int32), OPTS)
    kv.cache_pos[0] = len(toks)
    kv.context_shift(0, n_keep, n_discard)

    kept = toks[:n_keep] + toks[n_keep + n_discard :]
    kv2 = KVCache(cfg, 1, T, jnp.float32)
    t2 = np.asarray([kept], dtype=np.int32)
    p2 = np.arange(len(kept), dtype=np.int32)[None]
    _, kv2.caches = forward(params, cfg, t2, p2, kv2.caches, np.zeros(1, np.int32), OPTS)

    n = len(kept)
    k_a = np.asarray(kv.caches[0][0][0, :n])
    k_b = np.asarray(kv2.caches[0][0][0, :n])
    np.testing.assert_allclose(k_a, k_b, rtol=2e-5, atol=2e-5)
    v_a = np.asarray(kv.caches[0][1][0, :n])
    v_b = np.asarray(kv2.caches[0][1][0, :n])
    np.testing.assert_allclose(v_a, v_b, rtol=2e-5, atol=2e-5)
    assert kv.used(0) == n


def test_seq_cp_and_keep():
    cfg = tiny_config(n_layers=1)
    params = synth_params(cfg, GGMLType.Q4_K, seed=9)
    kv = KVCache(cfg, 2, 16, jnp.float32)
    t = np.asarray([[4, 5, 6]], dtype=np.int32)
    p = np.arange(3, dtype=np.int32)[None]
    row = [(k[0:1], v[0:1]) for k, v in kv.caches]
    _, row = forward(params, cfg, t, p, row, np.zeros(1, np.int32), OPTS)
    kv.caches = [(k.at[0].set(r[0][0]), v.at[0].set(r[1][0]))
                 for (k, v), r in zip(kv.caches, row)]
    kv.cache_pos[0] = 3
    kv.seq_cp(dst=1, src=0)
    assert kv.used(1) == 3
    np.testing.assert_array_equal(np.asarray(kv.caches[0][0][1]), np.asarray(kv.caches[0][0][0]))
    kv.seq_keep(1)
    assert kv.used(0) == 0 and kv.used(1) == 3


def test_engine_scan_mode_matches_indexable():
    """Engine auto-selects the lax.scan fast path for uniform models; its
    greedy output, context handling and embed() must match the indexable
    path exactly."""
    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import ForwardOptions, synth_params
    from prima_tpu.runtime.engine import Engine

    cfg = tiny_config(n_layers=3)
    params = synth_params(cfg, GGMLType.Q4_K, seed=9)
    opts = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)
    e_scan = Engine(cfg, params, n_slots=2, max_seq=64, n_batch=8, opts=opts,
                    kv_dtype=jnp.float32, scan=True)
    e_idx = Engine(cfg, params, n_slots=2, max_seq=64, n_batch=8, opts=opts,
                   kv_dtype=jnp.float32, scan=False)
    assert e_scan.use_scan and not e_idx.use_scan

    prompt = [3, 17, 42, 7, 99, 11, 23, 5, 61, 2]
    out_s = e_scan.run_to_completion(prompt, n_predict=12)
    out_i = e_idx.run_to_completion(prompt, n_predict=12)
    assert out_s == out_i

    v_s = e_scan.embed(prompt)
    v_i = e_idx.embed(prompt)
    np.testing.assert_allclose(v_s, v_i, rtol=2e-5, atol=2e-5)


def test_engine_scan_auto_eligibility():
    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import ForwardOptions, synth_params
    from prima_tpu.runtime.engine import Engine

    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=9)
    opts = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)
    assert Engine(cfg, params, n_slots=1, max_seq=32, opts=opts,
                  kv_dtype=jnp.float32).use_scan
    # a missing layer (pipeline-style partial load) forces the indexable path
    partial = dict(params)
    partial["layers"] = [params["layers"][0], None]
    assert not Engine(cfg, partial, n_slots=1, max_seq=32, opts=opts,
                      kv_dtype=jnp.float32).use_scan
