"""Quantized KV cache (-ctk q8_0 analogue)."""

import jax.numpy as jnp
import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import ForwardOptions, synth_params
from prima_tpu.ops.kvquant import KVQ8, quantize_kv
from prima_tpu.runtime.engine import Engine

OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 4, 64)).astype(np.float32))
    q, s = quantize_kv(x)
    y = np.asarray(q.astype(jnp.float32) * s)
    err = np.abs(y - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert err < 0.01  # int8 with per-vector scale


def test_engine_with_q8_kv_close_to_f32():
    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    prompt = [3, 17, 42, 7, 99, 5]
    ref = Engine(cfg, params, n_slots=1, max_seq=64, n_batch=16, opts=OPTS,
                 kv_dtype=jnp.float32).run_to_completion(prompt, n_predict=8)
    got = Engine(cfg, params, n_slots=1, max_seq=64, n_batch=16, opts=OPTS,
                 kv_dtype="q8_0").run_to_completion(prompt, n_predict=8)
    # int8 KV is a lossy cache: greedy tokens should agree at least initially
    assert got[:3] == ref[:3]
    assert len(got) == 8


def test_q8_kv_seq_ops():
    from prima_tpu.runtime.kv import KVCache

    cfg = tiny_config(n_layers=1)
    kv = KVCache(cfg, 2, 16, "q8_0")
    assert isinstance(kv.caches[0][0], KVQ8)
    # write something then copy / shift
    import jax

    rng = np.random.default_rng(1)
    row = jnp.asarray(rng.standard_normal((16, cfg.n_kv_heads, cfg.head_dim)).astype(np.float32))
    from prima_tpu.runtime.kv import _set_row

    k, v = kv.caches[0]
    kv.caches[0] = (_set_row(k, 0, row), _set_row(v, 0, row))
    kv.cache_pos[0] = 8
    kv.seq_cp(dst=1, src=0)
    assert kv.used(1) == 8
    np.testing.assert_array_equal(np.asarray(kv.caches[0][0].qs[1]),
                                  np.asarray(kv.caches[0][0].qs[0]))
    kv.context_shift(0, n_keep=2, n_discard=3)
    assert kv.used(0) == 5
    kv.seq_div(1, 0, 8, 2)  # smoke: re-rotation path for KVQ8


def test_kvq4_roundtrip():
    from prima_tpu.ops.kvquant import KVQ4, quantize_kv4

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 64)).astype(np.float32))
    q, s = quantize_kv4(x)
    assert q.shape == (2, 3, 4, 32) and q.dtype == jnp.uint8
    y = np.asarray(KVQ4(q, s).astype(jnp.float32))
    # 4-bit symmetric: error bounded by scale/2 per element
    err = np.abs(y - np.asarray(x))
    bound = np.asarray(s) / 2 + 1e-6
    assert np.all(err <= bound)


def test_kvq4_zeros_decode_to_zero():
    from prima_tpu.ops.kvquant import KVQ4

    c = KVQ4.zeros((1, 4, 2, 8))
    assert np.all(np.asarray(c.astype(jnp.float32)) == 0)


def test_engine_with_q4_kv():
    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import ForwardOptions, synth_params
    from prima_tpu.runtime.engine import Engine

    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    opts = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)
    ref = Engine(cfg, params, n_slots=1, max_seq=64, opts=opts,
                 kv_dtype=jnp.float32).run_to_completion([3, 17, 42, 7], n_predict=6)
    q4 = Engine(cfg, params, n_slots=1, max_seq=64, opts=opts,
                kv_dtype="q4_0").run_to_completion([3, 17, 42, 7], n_predict=6)
    assert len(q4) == 6
    # 4-bit KV is lossy: only require a matching start on a tiny model
    assert q4[0] == ref[0]
