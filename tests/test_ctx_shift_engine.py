"""Engine-level context shift + seq_add semantics + perf counters."""

import jax.numpy as jnp
import numpy as np

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import ForwardOptions, forward, init_kv_caches, synth_params
from prima_tpu.runtime.engine import Engine
from prima_tpu.runtime.kv import KVCache

OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


def test_engine_generates_past_context_with_shift():
    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    max_seq = 24
    eng = Engine(cfg, params, n_slots=1, max_seq=max_seq, n_batch=8, opts=OPTS,
                 kv_dtype=jnp.float32, ctx_shift=True, n_keep=2)
    prompt = [3, 17, 42, 7]
    n_new = max_seq + 10  # would overflow without the shift
    out = eng.run_to_completion(prompt, n_predict=n_new)
    assert len(out) == n_new
    slot = eng.slots[0]
    assert slot.stop_reason == "length"  # not context_full
    assert eng.kv.used(0) < max_seq

    # without shift: stops early with context_full
    eng2 = Engine(cfg, params, n_slots=1, max_seq=max_seq, n_batch=8, opts=OPTS,
                  kv_dtype=jnp.float32, ctx_shift=False)
    eng2.run_to_completion(prompt, n_predict=n_new)
    assert eng2.slots[0].stop_reason == "context_full"


def test_seq_add_move_exact_one_layer():
    """seq_add(move=True) equals re-encoding at shifted positions (1 layer)."""
    cfg = tiny_config(n_layers=1)
    params = synth_params(cfg, GGMLType.Q4_K, seed=9)
    toks = [5, 9, 2, 33, 11, 7]
    kv = KVCache(cfg, 1, 32, jnp.float32)
    t = np.asarray([toks], np.int32)
    p = np.arange(len(toks), dtype=np.int32)[None]
    _, kv.caches = forward(params, cfg, t, p, kv.caches, np.zeros(1, np.int32), OPTS)
    kv.cache_pos[0] = len(toks)
    # shift the tail [2, 6) down by 2 (as if tokens 0..1 were discarded...
    # actually: emulate discarding positions 2,3 is context_shift; here shift
    # the whole range [2,6) by -2 after manually dropping
    kv.seq_add(0, 2 + 2, len(toks), -2)  # move cells [4,6) -> [2,4)

    kept = toks[:2] + toks[4:]
    kv2 = KVCache(cfg, 1, 32, jnp.float32)
    t2 = np.asarray([kept], np.int32)
    p2 = np.arange(len(kept), dtype=np.int32)[None]
    _, kv2.caches = forward(params, cfg, t2, p2, kv2.caches, np.zeros(1, np.int32), OPTS)
    n = len(kept)
    np.testing.assert_allclose(np.asarray(kv.caches[0][0][0, :n]),
                               np.asarray(kv2.caches[0][0][0, :n]),
                               rtol=2e-5, atol=2e-5)


def test_perf_counters():
    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    eng = Engine(cfg, params, n_slots=1, max_seq=64, n_batch=8, opts=OPTS,
                 kv_dtype=jnp.float32)
    eng.run_to_completion([1, 2, 3, 4, 5, 6, 7, 8, 9], n_predict=5)
    assert eng.perf["n_prompt"] == 8  # prompt[:-1]
    assert eng.perf["n_decode"] == 5
    assert eng.perf["t_decode_s"] > 0
    assert "decode: 5 tokens" in eng.perf_summary()


def test_self_extend_grouped_attention():
    """Self-Extend (--grp-attn-n/-w): decoding runs past the group window,
    logical positions compress (pos_delta < 0) while cells keep streaming."""
    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    eng = Engine(cfg, params, n_slots=1, max_seq=64, n_batch=8, opts=OPTS,
                 kv_dtype=jnp.float32, grp_attn_n=2, grp_attn_w=8)
    prompt = [3, 17, 42, 7, 99, 5]
    out = eng.run_to_completion(prompt, n_predict=24)
    assert len(out) == 24
    slot = eng.slots[0]
    # the window was compressed at least once
    assert slot.ga_i > 0
    assert slot.pos_delta < 0
    # logical positions stay bounded well below the physical write index
    used = eng.kv.used(0)
    assert used == len(prompt) + 24 - 1
    assert used + slot.pos_delta < used
    # pos_map is monotically non-decreasing over live cells (order preserved)
    live = slot.pos_map[:used]
    assert np.all(np.diff(live) >= 0)


def test_self_extend_prefix_matches_plain():
    """Before the first compression triggers, output is identical to the
    plain engine (the ops are no-ops until n_past >= ga_w)."""
    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    prompt = [3, 17, 42, 7]
    plain = Engine(cfg, params, n_slots=1, max_seq=64, n_batch=8, opts=OPTS,
                   kv_dtype=jnp.float32).run_to_completion(prompt, n_predict=6)
    se = Engine(cfg, params, n_slots=1, max_seq=64, n_batch=8, opts=OPTS,
                kv_dtype=jnp.float32, grp_attn_n=4,
                grp_attn_w=32).run_to_completion(prompt, n_predict=6)
    assert se == plain
