"""N-gram cache + lookup decoding: drafting semantics, file format,
losslessness of the draft-free speculative path."""

import struct

import jax.numpy as jnp
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import ForwardOptions, synth_params
from prima_tpu.runtime import ngram_cache as nc
from prima_tpu.runtime.engine import Engine
from prima_tpu.runtime.ngram_cache import LookupDecoder
from prima_tpu.sampling import Sampler, SamplerParams

OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


def test_update_counts():
    cache = {}
    toks = [1, 2, 3, 1, 2, 3, 1, 2]
    nc.update(cache, 1, 2, toks, len(toks))
    # unigram (1,) -> 2 seen 3x
    assert cache[(1, -1, -1, -1)][2] == 3
    # bigram (1, 2) -> 3 seen 2x
    assert cache[(1, 2, -1, -1)][3] == 2
    # incremental update equals batch update
    c2 = {}
    nc.update(c2, 1, 2, toks[:5], 5)
    nc.update(c2, 1, 2, toks, 3)
    assert c2 == cache


def test_draft_repetition():
    # a strongly repetitive sequence drafts its own continuation
    toks = [5, 6, 7, 8] * 6
    ctx = {}
    nc.update(ctx, nc.NGRAM_MIN, nc.NGRAM_MAX, toks, len(toks))
    chain = [toks[-1]]  # last sampled token = 8
    nc.draft(toks, chain, 4, nc.NGRAM_MIN, nc.NGRAM_MAX, ctx, {}, {})
    assert chain[1:] == [5, 6, 7, 8]


def test_draft_needs_evidence():
    # a never-repeated sequence drafts nothing under the thresholds
    toks = list(range(50))
    ctx = {}
    nc.update(ctx, nc.NGRAM_MIN, nc.NGRAM_MAX, toks, len(toks))
    chain = [toks[-1]]
    nc.draft(toks, chain, 4, nc.NGRAM_MIN, nc.NGRAM_MAX, ctx, {}, {})
    assert chain[1:] == []


def test_save_load_merge_roundtrip(tmp_path):
    c1, c2 = {}, {}
    nc.update(c1, 2, 2, [1, 2, 3, 1, 2, 3], 6)
    nc.update(c2, 2, 2, [1, 2, 9, 9, 9], 5)
    p1, p2 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    nc.save(c1, p1)
    nc.save(c2, p2)
    assert nc.load(p1) == c1
    merged = nc.load(p1)
    nc.merge(merged, nc.load(p2))
    assert merged[(1, 2, -1, -1)][3] == 2  # from c1
    assert merged[(1, 2, -1, -1)][9] == 1  # from c2
    # reference binary record layout: 4 i32 ngram, i32 ntokens, pairs
    blob = open(p1, "rb").read()
    ng = struct.unpack_from("<4i", blob, 0)
    assert ng[2] == -1 and ng[3] == -1  # 2-gram padded with -1


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config(n_layers=2)
    return cfg, synth_params(cfg, GGMLType.Q4_K, seed=5)


def _engine(cfg, params):
    return Engine(cfg, params, n_slots=1, max_seq=128, n_batch=32, opts=OPTS,
                  kv_dtype=jnp.float32)


def test_lookup_lossless_vs_plain_greedy(model):
    cfg, params = model
    prompt = [3, 17, 42, 7, 3, 17, 42, 7, 3, 17]
    plain = _engine(cfg, params).run_to_completion(prompt, n_predict=16)
    dec = LookupDecoder(_engine(cfg, params), n_draft=4)
    out, stats = dec.generate(prompt, Sampler(SamplerParams(temp=0.0)),
                              n_predict=16)
    assert out == plain  # lossless regardless of lookup quality
    assert stats.n_target_calls <= 16


def test_lookup_accepts_on_repetitive_output(model):
    cfg, params = model
    # synth-weight models loop quickly; the context cache should pick the
    # repetition up and accept drafts (fewer target calls than tokens)
    prompt = [3, 17, 42, 7]
    dec = LookupDecoder(_engine(cfg, params), n_draft=6)
    out, stats = dec.generate(prompt, Sampler(SamplerParams(temp=0.0)),
                              n_predict=32)
    plain = _engine(cfg, params).run_to_completion(prompt, n_predict=32)
    assert out == plain
    if stats.n_drafted:  # drafting kicked in -> it must have paid off
        assert stats.n_target_calls < 32
    # session accumulated into the dynamic cache
    assert len(dec.nc_dynamic) > 0
