"""Sampler-chain semantics (mirrors the reference's tests/test-sampling.cpp)."""

import numpy as np
import pytest

from prima_tpu.sampling import (
    Sampler,
    SamplerParams,
    apply_min_p,
    apply_penalties,
    apply_tail_free,
    apply_top_k,
    apply_top_p,
    apply_typical,
    softmax,
)


def _logits(probs):
    return np.log(np.asarray(probs, dtype=np.float32))


def _kept_probs(logits, ids):
    """Probabilities (renormalized over ids, original order by ids)."""
    p = softmax(logits[ids])
    return {int(i): float(v) for i, v in zip(ids, p)}


def test_top_k():
    lg = _logits([0.1, 0.2, 0.3, 0.4])
    ids = apply_top_k(lg, 2)
    assert list(ids) == [3, 2]
    ids = apply_top_k(lg, 0)  # disabled: all, sorted desc
    assert list(ids) == [3, 2, 1, 0]


def test_top_p():
    lg = _logits([0.1, 0.2, 0.3, 0.4])
    ids = apply_top_k(lg, 0)
    assert list(apply_top_p(lg, ids, 0.0, 1)) == [3]
    assert list(apply_top_p(lg, ids, 0.7, 1)) == [3, 2]  # 0.4+0.3 >= 0.7
    assert list(apply_top_p(lg, ids, 1.0, 1)) == [3, 2, 1, 0]


def test_min_p():
    lg = _logits([0.1, 0.2, 0.3, 0.4])
    ids = apply_top_k(lg, 0)
    # threshold 0.49: keep p >= 0.49 * 0.4 = 0.196 (avoid the 0.2 knife-edge)
    kept = apply_min_p(lg, ids, 0.49, 1)
    assert list(kept) == [3, 2, 1]
    assert list(apply_min_p(lg, ids, 0.99, 1)) == [3]


def test_typical():
    # uniform-ish distribution: typical sampling keeps high-probability mass
    lg = _logits([0.97, 0.01, 0.01, 0.01])
    ids = apply_top_k(lg, 0)
    kept = apply_typical(lg, ids, 0.5, 1)
    assert list(kept) == [0]


def test_tail_free():
    lg = _logits([0.1, 0.15, 0.75])
    ids = apply_top_k(lg, 0)
    kept = apply_tail_free(lg, ids, 0.25, 1)
    assert kept[0] == 2 and len(kept) <= 2


def test_penalties_repeat():
    lg = _logits([0.2, 0.2, 0.2, 0.2, 0.2])
    apply_penalties(lg, [0, 1, 2], last_n=64, repeat=50.0, freq=0.0, present=0.0)
    p = softmax(lg)
    # penalized tokens collapse; 3 and 4 split the mass
    assert p[3] == pytest.approx(0.5, abs=1e-5)
    assert p[4] == pytest.approx(0.5, abs=1e-5)
    assert p[0] < 1e-4


def test_penalties_freq_present():
    lg = _logits([0.2, 0.2, 0.2, 0.2, 0.2])
    apply_penalties(lg, [0, 1, 2, 0, 0], last_n=64, repeat=1.0, freq=5.0, present=5.0)
    # token 0 occurs 3x -> -20; tokens 1,2 once -> -10; 3,4 untouched
    p = softmax(lg)
    assert p[3] > p[1] > p[0]


def test_greedy_temp_zero():
    s = Sampler(SamplerParams(temp=0.0))
    lg = _logits([0.1, 0.6, 0.3])
    assert s.sample(lg) == 1


def test_dist_seeded_reproducible():
    p = SamplerParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0, seed=42)
    a = Sampler(p)
    b = Sampler(p)
    lg = _logits([0.25, 0.25, 0.25, 0.25])
    seq_a = [a.sample_and_accept(lg) for _ in range(16)]
    seq_b = [b.sample_and_accept(lg) for _ in range(16)]
    assert seq_a == seq_b
    assert len(set(seq_a)) > 1  # actually stochastic


def test_logit_bias():
    p = SamplerParams(temp=0.0, logit_bias={0: +100.0})
    s = Sampler(p)
    lg = _logits([0.01, 0.5, 0.49])
    assert s.sample(lg) == 0


def test_mirostat_v2_runs():
    p = SamplerParams(mirostat=2, temp=1.0, seed=7)
    s = Sampler(p)
    rng = np.random.default_rng(0)
    lg = rng.standard_normal(100).astype(np.float32)
    toks = [s.sample_and_accept(lg) for _ in range(32)]
    assert all(0 <= t < 100 for t in toks)
    assert np.isfinite(s.mu)


def test_mirostat_v1_runs():
    p = SamplerParams(mirostat=1, temp=1.0, seed=7)
    s = Sampler(p, n_vocab=100)
    rng = np.random.default_rng(0)
    lg = rng.standard_normal(100).astype(np.float32)
    toks = [s.sample_and_accept(lg) for _ in range(32)]
    assert all(0 <= t < 100 for t in toks)


def test_chain_order_filters_compose():
    # top_k=2 then top_p=0.9: candidates reduce progressively
    p = SamplerParams(temp=1.0, top_k=2, top_p=0.5, min_p=0.0, seed=1)
    s = Sampler(p)
    lg = _logits([0.05, 0.05, 0.6, 0.3])
    toks = {s.sample(lg) for _ in range(32)}
    assert toks == {2}  # top_k keeps {2,3}; top_p 0.5 keeps {2}
