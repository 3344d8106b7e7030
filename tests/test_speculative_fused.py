"""On-device fused speculative decoding (VERDICT r3 task 6).

Losslessness is the invariant: because the accept step samples every
position with the SAME device key schedule as plain fused decoding
(fold_in(PRNGKey(seed), absolute token index)), fused-speculative output
must be token-identical to Engine.step_fused for every supported chain —
greedy AND seeded dist — regardless of draft quality. Reference:
common/speculative.cpp; up to +80% claimed (README.md:117-118).
"""

import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import synth_params
from prima_tpu.runtime.engine import Engine
from prima_tpu.runtime.speculative_fused import (FusedSpeculative,
                                                 fused_spec_eligible)
from prima_tpu.sampling import Sampler, SamplerParams

CFG = dict(n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2, head_dim=16,
           n_ff=128, n_vocab=257)


def mk_engine(seed=0, layers=None, **kw):
    cfg = tiny_config(**{**CFG, **({"n_layers": layers} if layers else {})})
    return Engine(cfg, synth_params(cfg, GGMLType.Q8_0, seed=seed),
                  n_slots=2, max_seq=96, n_batch=16, **kw)


def plain_fused(eng, prompt, sampler, n):
    s = eng.submit(prompt, sampler=sampler, n_predict=n)
    out = []
    while s.state.name != "IDLE":
        for ev in eng.step_fused():
            if ev.token is not None:
                out.append(ev.token)
    return out


@pytest.mark.parametrize("sp", [
    SamplerParams(temp=0.0, seed=5),
    pytest.param(SamplerParams(temp=0.9, top_k=40, top_p=0.92, min_p=0.02,
                               seed=5), marks=pytest.mark.slow),
], ids=["greedy", "dist"])
def test_fused_spec_matches_plain_fused(sp):
    import dataclasses

    prompt = [3, 14, 15, 9, 26]
    want = plain_fused(mk_engine(), prompt,
                       Sampler(dataclasses.replace(sp)), 20)

    # draft = same weights (accepts nearly everything)
    spec = FusedSpeculative(mk_engine(), mk_engine(), n_draft=4, rounds=3)
    got, stats = spec.generate(prompt, Sampler(dataclasses.replace(sp)),
                               n_predict=20)
    assert got == want
    assert stats.n_drafted > 0


def test_fused_spec_lossless_with_bad_draft():
    """A draft with DIFFERENT weights must not change the output, only the
    acceptance rate."""
    prompt = [3, 14, 15, 9]
    want = plain_fused(mk_engine(), prompt,
                       Sampler(SamplerParams(temp=0.0)), 16)
    spec = FusedSpeculative(mk_engine(), mk_engine(seed=99), n_draft=4,
                            rounds=3)
    got, stats = spec.generate(prompt, Sampler(SamplerParams(temp=0.0)),
                               n_predict=16)
    assert got == want
    assert stats.n_accepted <= stats.n_drafted


@pytest.mark.slow
def test_fused_spec_multiple_dispatches():
    """n_predict spanning several host dispatches (rounds=1, small chunk)
    keeps the stream identical — the cross-dispatch carry (cur token,
    draft catch-up) is exercised."""
    prompt = [7, 3, 2]
    want = plain_fused(mk_engine(), prompt,
                       Sampler(SamplerParams(temp=0.8, top_k=20, seed=9)),
                       24)
    spec = FusedSpeculative(mk_engine(), mk_engine(), n_draft=3, rounds=1)
    got, _ = spec.generate(prompt,
                           Sampler(SamplerParams(temp=0.8, top_k=20,
                                                 seed=9)), n_predict=24)
    assert got == want


def test_fused_spec_eligibility():
    assert fused_spec_eligible(Sampler(SamplerParams(temp=0.0)))
    assert fused_spec_eligible(Sampler(SamplerParams(temp=0.9, top_k=40)))
    assert not fused_spec_eligible(Sampler(SamplerParams(temp=0.9, top_k=0)))
    assert not fused_spec_eligible(Sampler(SamplerParams(mirostat=2)))
    assert not fused_spec_eligible(
        Sampler(SamplerParams(temp=0.9, top_k=40, penalty_last_n=8,
                              penalty_repeat=1.2)))
    assert not fused_spec_eligible(
        Sampler(SamplerParams(temp=0.9, top_k=40, logit_bias={3: 1.0})))


@pytest.mark.slow
def test_fused_spec_stops_at_eog():
    """EOG inside an accepted prefix truncates and stops, like plain."""
    eng_t, eng_d = mk_engine(), mk_engine()
    # pick the greedy-loop's 6th token as EOG so it triggers mid-stream
    probe = plain_fused(mk_engine(), [3, 14, 15],
                        Sampler(SamplerParams(temp=0.0)), 12)
    eog = probe[5]
    want = []
    for t in probe:
        want.append(t)
        if t == eog:
            break
    eng_t.eog_ids = {eog}
    spec = FusedSpeculative(eng_t, eng_d, n_draft=4, rounds=3)
    got, _ = spec.generate([3, 14, 15], Sampler(SamplerParams(temp=0.0)),
                           n_predict=12)
    assert got == want


def test_fused_spec_catchup_carries_per_round():
    """With draft == target and p_min=0, greedy drafts must be accepted at
    ~100% across MANY rounds within one dispatch. Regression: draft_step
    once closed over the dispatch-level catch_tok/need_catch instead of the
    per-round carry, so after the first full-acceptance round the draft KV
    history went (and stayed) one token short, silently degrading
    acceptance for the rest of the dispatch."""
    prompt = [3, 14, 15, 9, 26]
    spec = FusedSpeculative(mk_engine(), mk_engine(), n_draft=3, rounds=6,
                            p_min=0.0)
    got, stats = spec.generate(prompt, Sampler(SamplerParams(temp=0.0)),
                               n_predict=24)
    assert stats.n_target_calls >= 4  # several rounds actually ran
    # identical weights + greedy + p_min=0 => every draft should match
    # (the last round may be clipped by n_left)
    assert stats.n_accepted >= stats.n_drafted - spec.n_draft
    assert stats.n_accepted / max(stats.n_drafted, 1) > 0.85
