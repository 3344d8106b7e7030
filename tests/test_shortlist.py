"""Engine device-shortlist sampling path (VERDICT r3 task 5).

For chains the fused loop can't take, Engine.step ships a top-256
(vals, ids, logsumexp) shortlist instead of the full f32 vocab row and
runs the host chain on a reconstructed virtual row. These tests pin:
  * exactness — identical tokens vs the full-row host path for every
    eligible chain family (tfs, typical, dynatemp, penalties, greedy);
  * the eligibility rule — configs that could need out-of-shortlist
    candidates (mirostat, positive bias, unbounded top-k, anti-penalty)
    fall back to the full row;
  * n_probs logprobs are exact (vs full-row softmax);
  * grammar dead-end falls back to the true row and still produces a
    grammar-valid token;
  * draw-path invariance — same seed produces the same stream through
    step(), shortlist step(), and step_fused().
Reference role: zero-transfer-cost sampling, common/sampling.cpp.
"""

import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import synth_params
from prima_tpu.runtime.engine import Engine
from prima_tpu.sampling import Sampler, SamplerParams

CFG = dict(n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, head_dim=16,
           n_ff=128, n_vocab=512)


def mk_engine(n_slots=2, **kw):
    cfg = tiny_config(**CFG)
    return Engine(cfg, synth_params(cfg, GGMLType.Q8_0), n_slots=n_slots,
                  max_seq=96, n_batch=16, **kw)


def run(eng, prompt, sampler, n=10, fused=False, n_probs=0):
    s = eng.submit(prompt, sampler=sampler, n_predict=n, n_probs=n_probs)
    evs = []
    while s.state.name != "IDLE":
        evs.extend(eng.step_fused() if fused else eng.step())
    return [e.token for e in evs if e.token is not None], evs


def force_full_row(eng):
    """Disable the shortlist so step() takes the legacy full-row path."""
    eng._slot_shortlist_ok = lambda s: False


@pytest.mark.parametrize("params", [
    SamplerParams(temp=0.0, seed=3),
    SamplerParams(temp=0.9, top_k=40, top_p=0.9, min_p=0.05, seed=3),
    SamplerParams(temp=0.8, top_k=32, tfs_z=0.9, seed=3),
    pytest.param(SamplerParams(temp=0.8, top_k=32, typ_p=0.8, seed=3),
                 marks=pytest.mark.slow),
    pytest.param(SamplerParams(temp=0.7, top_k=24, dynatemp_range=0.4,
                               seed=3), marks=pytest.mark.slow),
    pytest.param(SamplerParams(temp=0.9, top_k=40, penalty_last_n=16,
                               penalty_repeat=1.3, penalty_freq=0.1,
                               seed=3), marks=pytest.mark.slow),
], ids=["greedy", "topk_topp_minp", "tfs", "typical", "dynatemp",
        "penalties"])
def test_shortlist_matches_full_row(params):
    import dataclasses

    prompt = [3, 14, 15, 9, 26, 5]
    eng_a = mk_engine()
    got_a, _ = run(eng_a, prompt, Sampler(dataclasses.replace(params)))

    eng_b = mk_engine()
    force_full_row(eng_b)
    got_b, _ = run(eng_b, prompt, Sampler(dataclasses.replace(params)))
    assert got_a == got_b


def test_shortlist_is_taken_and_fallbacks_hold():
    eng = mk_engine()
    ok = eng._slot_shortlist_ok

    class S:  # fake slot carrying just what the rule reads
        def __init__(self, p, prev=()):
            self.sampler = Sampler(p)
            self.sampler.prev = list(prev)

    assert ok(S(SamplerParams(temp=0.8, top_k=40)))
    assert ok(S(SamplerParams(temp=0.0)))
    # unbounded top-k needs the whole vocab
    assert not ok(S(SamplerParams(temp=0.8, top_k=0)))
    assert not ok(S(SamplerParams(temp=0.8, top_k=10_000)))
    # mirostat's candidate set is mu-bounded, not rank-bounded
    assert not ok(S(SamplerParams(temp=0.8, mirostat=2)))
    # positive logit bias can promote any token
    assert not ok(S(SamplerParams(temp=0.8, top_k=40,
                                  logit_bias={7: 5.0})))
    # negative bias only demotes: still eligible
    assert ok(S(SamplerParams(temp=0.8, top_k=40, logit_bias={7: -5.0})))
    # anti-penalty (repeat < 1) raises window logits
    assert not ok(S(SamplerParams(temp=0.8, top_k=40, penalty_last_n=8,
                                  penalty_repeat=0.5), prev=[1, 2, 3]))
    # k + W must fit in the shortlist
    big_prev = list(range(300))
    assert not ok(S(SamplerParams(temp=0.8, top_k=240, penalty_last_n=-1,
                                  penalty_repeat=1.2), prev=big_prev))


def test_shortlist_n_probs_exact():
    prompt = [3, 14, 15, 9]
    eng_a = mk_engine()
    _, evs_a = run(eng_a, prompt, Sampler(SamplerParams(temp=0.0)), n=4,
                   n_probs=5)
    eng_b = mk_engine()
    force_full_row(eng_b)
    _, evs_b = run(eng_b, prompt, Sampler(SamplerParams(temp=0.0)), n=4,
                   n_probs=5)
    for ea, eb in zip(evs_a, evs_b):
        assert [t for t, _ in ea.logprobs] == [t for t, _ in eb.logprobs]
        for (ta, la), (tb, lb) in zip(ea.logprobs, eb.logprobs):
            assert abs(la - lb) < 1e-4, (ta, la, lb)


def test_shortlist_grammar_dead_end_falls_back():
    """Grammar only admits a token far outside the top-256: the shortlist
    path must fetch the true row and still return a valid token."""
    from prima_tpu.grammar.engine import GrammarSampler

    eng = mk_engine()
    v = eng.cfg.n_vocab
    # token_bytes: every token maps to 'a' except token 7 -> 'z'
    token_bytes = [b"a"] * v
    token_bytes[7] = b"z"
    g = GrammarSampler('root ::= "z"', token_bytes)
    sampler = Sampler(SamplerParams(temp=0.9, top_k=40, seed=5), grammar=g)
    # make token 7 the worst logit so it can't be in any shortlist:
    # bias it down hard (negative bias keeps shortlist eligibility)
    sampler.p.logit_bias = {7: -1e9}
    got, _ = run(eng, [3, 14, 15], sampler, n=1)
    assert got == [7]


def test_draw_path_invariance_step_vs_fused():
    """Same seeded request: identical stream through host step() (which
    now routes eligible dist slots through the device key schedule) and
    through step_fused()."""
    prompt = [3, 14, 15, 9, 26]
    p = SamplerParams(temp=0.9, top_k=40, top_p=0.92, min_p=0.02, seed=11)
    eng_a = mk_engine()
    got_a, _ = run(eng_a, prompt, Sampler(p), n=8, fused=False)
    eng_b = mk_engine()
    got_b, _ = run(eng_b, prompt, Sampler(p), n=8, fused=True)
    assert got_a == got_b


def test_fused_n_probs_matches_host():
    """n_probs now rides the fused chunk (VERDICT r3 task 9): same ids and
    logprobs as the host full-row path."""
    prompt = [3, 14, 15, 9]
    eng_a = mk_engine()
    s = eng_a.submit(prompt, sampler=Sampler(SamplerParams(temp=0.0)), n_predict=6,
                     n_probs=4)
    evs_a = []
    while s.state.name != "IDLE":
        evs_a.extend(eng_a.step_fused())

    eng_b = mk_engine()
    force_full_row(eng_b)
    _, evs_b = run(eng_b, prompt, Sampler(SamplerParams(temp=0.0)), n=6,
                   n_probs=4)
    assert [e.token for e in evs_a] == [e.token for e in evs_b]
    for ea, eb in zip(evs_a, evs_b):
        assert ea.logprobs is not None
        assert [t for t, _ in ea.logprobs] == [t for t, _ in eb.logprobs]
        for (ta, la), (tb, lb) in zip(ea.logprobs, eb.logprobs):
            assert abs(la - lb) < 1e-4


def test_fused_self_extend_matches_host_step():
    """Self-Extend (--grp-attn-n) now runs through the fused chunk path:
    token stream identical to the per-token host step() path."""
    cfg = tiny_config(**CFG)
    kw = dict(grp_attn_n=2, grp_attn_w=8, max_seq=96, n_batch=16)
    eng_a = Engine(cfg, synth_params(cfg, GGMLType.Q8_0), n_slots=2, **kw)
    eng_b = Engine(cfg, synth_params(cfg, GGMLType.Q8_0), n_slots=2, **kw)
    prompt = [3, 14, 15, 9, 26, 5]
    sa = eng_a.submit(prompt, sampler=Sampler(SamplerParams(temp=0.0)),
                      n_predict=24)
    got_a = []
    while sa.state.name != "IDLE":
        for ev in eng_a.step_fused():
            if ev.token is not None:
                got_a.append(ev.token)
    sb = eng_b.submit(prompt, sampler=Sampler(SamplerParams(temp=0.0)),
                      n_predict=24)
    got_b = []
    while sb.state.name != "IDLE":
        for ev in eng_b.step():
            if ev.token is not None:
                got_b.append(ev.token)
    assert got_a == got_b
