"""Piped-ring pipeline + tensor/data parallelism vs single-device forward.

The multi-chip analogue of the reference's Docker-simulated distributed run
(README.md:232-268): an 8-virtual-device CPU mesh (dp=2, pp=2, tp=2) must
produce the same logits as the plain single-device forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import (
    ForwardOptions,
    forward,
    init_kv_caches,
    synth_host_head,
    synth_host_layer,
)
from prima_tpu.parallel.mesh import make_mesh
from prima_tpu.parallel.pipeline import (
    PipeSpec,
    build_pipe_model,
    init_pipe_kv,
    make_pipe_forward,
)
from prima_tpu.quant.dequant_jax import QTensor


GG = GGMLType.Q4_K
OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


def _cfg(n_layers=4, qkv_bias=False):
    return tiny_config(n_layers=n_layers, qkv_bias=qkv_bias)


def _single_device_params(cfg, seed=0):
    def conv(t):
        if t is None:
            return None
        if hasattr(t, "ggml_type"):
            return QTensor.from_host(t)
        return jax.device_put(np.asarray(t))

    head = synth_host_head(cfg, GG, seed)
    return {
        "tok_embd": conv(head["tok_embd"]),
        "layers": [
            {k: conv(v) for k, v in synth_host_layer(cfg, i, GG, seed).items()}
            for i in range(cfg.n_layers)
        ],
        "output_norm": conv(head["output_norm"]),
        "output": conv(head["output"]),
    }


def _reference_logits(cfg, tokens, positions, cache_pos, max_seq, seed=0):
    params = _single_device_params(cfg, seed)
    kv = init_kv_caches(cfg, tokens.shape[0], max_seq, jnp.float32)
    logits, kv = forward(params, cfg, tokens, positions, kv, cache_pos, OPTS)
    return logits, kv


def _pipe_setup(cfg, mesh, spec, seed=0):
    params = build_pipe_model(
        lambda i: synth_host_layer(cfg, i, GG, seed),
        synth_host_head(cfg, GG, seed),
        cfg, spec, mesh,
    )
    fwd = jax.jit(make_pipe_forward(cfg, spec, mesh, OPTS))
    return params, fwd


@pytest.mark.parametrize("dp,pp,tp,k", [(2, 2, 2, 2), (1, 4, 2, 1), (1, 2, 1, 2)])
def test_pipeline_matches_single_device(cpu_devices, dp, pp, tp, k):
    cfg = _cfg(n_layers=4)
    mesh = make_mesh(dp=dp, pp=pp, tp=tp)
    M = pp  # full pipeline
    B, S, T = 2, 4, 16
    spec = PipeSpec.for_model(cfg, n_pp=pp, n_tp=tp, n_dp=dp, k_cycles=k, microbatches=M)
    params, fwd = _pipe_setup(cfg, mesh, spec)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.n_vocab, size=(M, B, S)).astype(np.int32)
    positions = np.broadcast_to(np.arange(S, dtype=np.int32), (M, B, S)).copy()
    cache_pos = np.zeros((M, B), np.int32)

    kv = init_pipe_kv(cfg, spec, mesh, B, T, jnp.float32)
    logits, kv = fwd(params, tokens, positions, cache_pos, kv)
    assert logits.shape == (M, B, S, cfg.n_vocab)

    # reference: all microbatches flattened into one batch
    ref, _ = _reference_logits(
        cfg, tokens.reshape(M * B, S), positions.reshape(M * B, S),
        cache_pos.reshape(M * B), T,
    )
    got = np.asarray(logits).reshape(M * B, S, cfg.n_vocab)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pipeline_decode_after_prefill(cpu_devices):
    """Prefill then one decode step; KV carried through the ring correctly."""
    cfg = _cfg(n_layers=4, qkv_bias=True)  # qwen2-style biases through TP
    dp, pp, tp, k = 1, 2, 2, 2
    mesh = make_mesh(dp=dp, pp=pp, tp=tp)
    M, B, S, T = 2, 1, 4, 16
    spec = PipeSpec.for_model(cfg, n_pp=pp, n_tp=tp, n_dp=dp, k_cycles=k, microbatches=M)
    params, fwd = _pipe_setup(cfg, mesh, spec)

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.n_vocab, size=(M, B, S)).astype(np.int32)
    positions = np.broadcast_to(np.arange(S, dtype=np.int32), (M, B, S)).copy()
    cache_pos = np.zeros((M, B), np.int32)
    kv = init_pipe_kv(cfg, spec, mesh, B, T, jnp.float32)
    logits, kv = fwd(params, tokens, positions, cache_pos, kv)

    next_tok = np.asarray(jnp.argmax(logits[:, :, -1], axis=-1)).astype(np.int32)[..., None]
    pos2 = np.full((M, B, 1), S, np.int32)
    cp2 = np.full((M, B), S, np.int32)
    logits2, kv = fwd(params, next_tok, pos2, cp2, kv)

    # reference path
    refp = _single_device_params(cfg)
    rkv = init_kv_caches(cfg, M * B, T, jnp.float32)
    rlog, rkv = forward(refp, cfg, tokens.reshape(M * B, S), positions.reshape(M * B, S),
                        rkv, cache_pos.reshape(M * B), OPTS)
    rnext = np.asarray(jnp.argmax(rlog[:, -1], axis=-1)).astype(np.int32)[:, None]
    np.testing.assert_array_equal(next_tok.reshape(M * B, 1), rnext)
    rlog2, _ = forward(refp, cfg, rnext, pos2.reshape(M * B, 1), rkv, cp2.reshape(M * B), OPTS)
    np.testing.assert_allclose(
        np.asarray(logits2).reshape(M * B, cfg.n_vocab),
        np.asarray(rlog2).reshape(M * B, cfg.n_vocab),
        rtol=2e-4, atol=2e-4,
    )
