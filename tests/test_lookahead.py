"""Lookahead decoding: losslessness, n-gram acceptance, KV-commit
correctness (reference examples/lookahead/lookahead.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import ForwardOptions, synth_params
from prima_tpu.runtime.engine import Engine
from prima_tpu.runtime.lookahead import LookaheadDecoder
from prima_tpu.sampling import Sampler, SamplerParams

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


def _engine(cfg, params, **kw):
    return Engine(cfg, params, n_slots=1, max_seq=256, n_batch=32, opts=OPTS,
                  kv_dtype=jnp.float32, **kw)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    return cfg, params


def test_lossless_vs_plain_greedy(model):
    cfg, params = model
    prompt = [3, 17, 42, 7, 99, 5]
    plain = _engine(cfg, params).run_to_completion(prompt, n_predict=24)

    la = LookaheadDecoder(_engine(cfg, params), W=4, N=3, G=3)
    out, stats = la.generate(prompt, Sampler(SamplerParams(temp=0.0)),
                             n_predict=24)
    assert out == plain  # lossless regardless of guess quality
    assert stats.n_predict >= 24


def test_lossless_larger_window(model):
    cfg, params = model
    prompt = [11, 2, 63]
    plain = _engine(cfg, params).run_to_completion(prompt, n_predict=16)
    la = LookaheadDecoder(_engine(cfg, params), W=6, N=4, G=4)
    out, _ = la.generate(prompt, Sampler(SamplerParams(temp=0.0)),
                         n_predict=16)
    assert out == plain


def test_seeded_pool_accepts_and_saves_steps(model):
    """Seed the n-gram pool with the true greedy continuation: every
    verification window must be accepted in full, so the decode needs
    ~n_predict/(N-1) steps instead of n_predict (and stays lossless)."""
    cfg, params = model
    prompt = [3, 17, 42, 7]
    n, N = 20, 4
    plain = _engine(cfg, params).run_to_completion(prompt, n_predict=n)

    la = LookaheadDecoder(_engine(cfg, params), W=4, N=N, G=4)
    # pool maps first-token -> following (N-1)-gram along the true path
    path = [prompt[-1]] + plain
    for i in range(len(path) - (N - 1)):
        la.pool.add(path[i], np.asarray(path[i + 1: i + N], np.int32))

    out, stats = la.generate(prompt, Sampler(SamplerParams(temp=0.0)),
                             n_predict=n)
    assert out == plain
    assert stats.n_accept > 0
    # full acceptance: every step commits up to N-1 verified tokens + 1
    assert stats.n_steps <= -(-n // (N - 1)) + 1


def test_pool_dedup_and_ring():
    from prima_tpu.runtime.lookahead import _NgramPool

    pool = _NgramPool(n_vocab=32, N=3, G=2)
    pool.add(5, np.asarray([1, 2], np.int32))
    pool.add(5, np.asarray([1, 2], np.int32))  # duplicate: dropped
    assert pool.cnt[5] == 1
    pool.add(5, np.asarray([3, 4], np.int32))
    assert pool.cnt[5] == 2
    pool.add(5, np.asarray([5, 6], np.int32))  # ring wraps, cnt capped at G
    assert pool.cnt[5] == 2
    assert {tuple(g) for g in pool.tokens[5]} == {(5, 6), (3, 4)}


def test_guards(model):
    cfg, params = model
    with pytest.raises(ValueError):
        LookaheadDecoder(_engine(cfg, params), W=4, N=2, G=4)
    import dataclasses

    eng = _engine(cfg, params)
    eng.cfg = dataclasses.replace(cfg, alibi_max_bias=8.0)
    with pytest.raises(ValueError):
        LookaheadDecoder(eng, W=4, N=3, G=4)


def test_lookahead_tool_e2e(tmp_path):
    """GGUF -> loader -> lookahead CLI: lossless vs the plain CLI."""
    import io
    import sys

    from prima_tpu.tools.cli import main as cli_main
    from prima_tpu.tools.lookahead import main as la_main
    from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf

    path = str(tmp_path / "tiny.gguf")
    make_tiny_gguf(path, seed=3)

    def run(fn, args):
        old = sys.stdout
        sys.stdout = cap = io.StringIO()
        try:
            rc = fn(args)
        finally:
            sys.stdout = old
        assert rc == 0
        return cap.getvalue()

    plain = run(cli_main, ["-m", path, "-p", "Hello", "-n", "8", "--temp",
                           "0", "--matmul", "xla", "--no-display-prompt"])
    la = run(la_main, ["-m", path, "-p", "Hello", "-n", "8", "--temp", "0",
                       "--matmul", "xla", "--lookahead-w", "4",
                       "--lookahead-n", "3", "--lookahead-g", "4"])
    assert plain.strip() in la.strip()


def test_lossless_long_run_with_pool_churn(model):
    """Regression: the n-gram pool mutates during a step (observe at v==0);
    verification must use the snapshot taken at batch-build time or a
    repeated first token desyncs accept decisions from the batch content."""
    cfg, params = model
    prompt = [7, 7, 7, 9]
    plain = _engine(cfg, params).run_to_completion(prompt, n_predict=40)
    la = LookaheadDecoder(_engine(cfg, params), W=5, N=4, G=3)
    out, stats = la.generate(prompt, Sampler(SamplerParams(temp=0.0)),
                             n_predict=40)
    assert out == plain
    assert stats.n_steps >= 1


def test_seeded_sampling_deterministic(model):
    """With temp > 0 lookahead is not token-identical to plain decoding
    (different sampler invocation order), but a fixed seed must reproduce."""
    cfg, params = model
    prompt = [3, 17, 42]

    def run():
        la = LookaheadDecoder(_engine(cfg, params), W=4, N=3, G=3)
        out, _ = la.generate(
            prompt, Sampler(SamplerParams(temp=0.9, seed=11),
                            n_vocab=cfg.n_vocab), n_predict=12)
        return out

    assert run() == run()
