"""Sequence-parallel (context-sharded) attention over the mesh.

The long-context axis the reference lacks (SURVEY §5.7): the KV cache's T
axis shards over the mesh's `sp` axis, attention runs blockwise per shard
and combines with a log-sum-exp psum (ops/layers.gqa_attention_sp).
Validated against the dense single-device forward on the virtual 8-device
CPU mesh at an n_ctx where dense still fits, plus a per-device KV-memory
assertion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import (ForwardOptions, forward, init_kv_caches,
                                    synth_host_head, synth_host_layer)
from prima_tpu.parallel.mesh import make_mesh
from prima_tpu.parallel.pipeline import (PipeSpec, build_pipe_model,
                                         init_pipe_kv, make_pipe_forward)
from prima_tpu.quant.dequant_jax import QTensor

GG = GGMLType.Q4_K
OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


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


def _pipe(cfg, mesh, spec, seed=0):
    params = build_pipe_model(
        lambda i: synth_host_layer(cfg, i, GG, seed),
        synth_host_head(cfg, GG, seed), cfg, spec, mesh)
    return params, jax.jit(make_pipe_forward(cfg, spec, mesh, OPTS))


@pytest.mark.parametrize("pp,sp,tp", [
    (2, 2, 2),
    pytest.param(1, 4, 2, marks=pytest.mark.slow),
    pytest.param(2, 4, 1, marks=pytest.mark.slow),
])
def test_seq_parallel_matches_dense(cpu_devices, pp, sp, tp):
    cfg = tiny_config(n_layers=2)
    mesh = make_mesh(dp=1, pp=pp, sp=sp, tp=tp)
    M, B, S, T = pp, 2, 8, 32
    spec = PipeSpec.for_model(cfg, n_pp=pp, n_tp=tp, n_dp=1, k_cycles=1,
                              microbatches=M, n_sp=sp)
    params, fwd = _pipe(cfg, mesh, spec)
    kv = init_pipe_kv(cfg, spec, mesh, B, T, jnp.float32, seq_shards=sp)

    rng = np.random.default_rng(7)
    tokens = rng.integers(0, cfg.n_vocab, size=(M, B, S)).astype(np.int32)
    positions = np.broadcast_to(np.arange(S, dtype=np.int32), (M, B, S)).copy()
    cache_pos = np.zeros((M, B), np.int32)
    logits, kv = fwd(params, tokens, positions, cache_pos, kv)

    refp = _single_device_params(cfg)
    rkv = init_kv_caches(cfg, M * B, T, jnp.float32)
    rlog, rkv = forward(refp, cfg, tokens.reshape(M * B, S),
                        positions.reshape(M * B, S), rkv,
                        cache_pos.reshape(M * B), OPTS)
    np.testing.assert_allclose(
        np.asarray(logits).reshape(M * B, S, cfg.n_vocab),
        np.asarray(rlog), rtol=2e-4, atol=2e-4)

    # decode step whose KV prefix STRADDLES the shard boundary (S=8 spans
    # cells 0..7 of shard 0 at T_loc=8 for sp=4): next token writes to the
    # next shard and must still see the whole prefix
    nxt = np.asarray(jnp.argmax(logits[:, :, -1], axis=-1)
                     ).astype(np.int32)[..., None]
    pos2 = np.full((M, B, 1), S, np.int32)
    cp2 = np.full((M, B), S, np.int32)
    logits2, kv = fwd(params, nxt, pos2, cp2, kv)

    rnext = np.asarray(jnp.argmax(rlog[:, -1], axis=-1)
                       ).astype(np.int32)[:, None]
    np.testing.assert_array_equal(nxt.reshape(M * B, 1), rnext)
    rlog2, _ = forward(refp, cfg, rnext, pos2.reshape(M * B, 1), rkv,
                       cp2.reshape(M * B), OPTS)
    np.testing.assert_allclose(
        np.asarray(logits2).reshape(M * B, cfg.n_vocab),
        np.asarray(rlog2).reshape(M * B, cfg.n_vocab),
        rtol=2e-4, atol=2e-4)


def test_seq_parallel_kv_memory_per_device(cpu_devices):
    """The point of sp: per-device KV bytes shrink linearly with shards."""
    cfg = tiny_config(n_layers=2)
    T, B = 64, 2

    def kv_shard_bytes(sp):
        mesh = make_mesh(dp=1, pp=2, sp=sp, tp=1)
        spec = PipeSpec.for_model(cfg, n_pp=2, n_tp=1, n_dp=1, k_cycles=1,
                                  microbatches=2, n_sp=sp)
        kv = init_pipe_kv(cfg, spec, mesh, B, T, jnp.float32, seq_shards=sp)
        k = kv[0]
        shard = k.sharding.shard_shape(k.shape)
        assert shard[4] == T // sp  # the T axis is what shards
        return int(np.prod(shard)) * k.dtype.itemsize

    assert kv_shard_bytes(4) * 4 == kv_shard_bytes(1) * 1 * 4 // 4 * 4 \
        or True  # explicit relation below
    b1, b4 = kv_shard_bytes(1), kv_shard_bytes(4)
    assert b4 * 4 == b1


def test_seq_parallel_quantized_kv(cpu_devices):
    """int8 KV + sequence shards compose."""
    cfg = tiny_config(n_layers=2)
    mesh = make_mesh(dp=1, pp=2, sp=2, tp=2)
    M, B, S, T = 2, 1, 8, 32
    spec = PipeSpec.for_model(cfg, n_pp=2, n_tp=2, n_dp=1, k_cycles=1,
                              microbatches=M, n_sp=2)
    params, fwd = _pipe(cfg, mesh, spec)
    kv = init_pipe_kv(cfg, spec, mesh, B, T, "q8_0", seq_shards=2)

    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.n_vocab, size=(M, B, S)).astype(np.int32)
    positions = np.broadcast_to(np.arange(S, dtype=np.int32), (M, B, S)).copy()
    logits, kv = fwd(params, tokens, positions, np.zeros((M, B), np.int32),
                     kv)

    refp = _single_device_params(cfg)
    rkv = init_kv_caches(cfg, M * B, T, jnp.float32)
    rlog, _ = forward(refp, cfg, tokens.reshape(M * B, S),
                      positions.reshape(M * B, S), rkv,
                      np.zeros(M * B, np.int32), OPTS)
    # int8 KV tolerance (same bound test_kvquant uses for the dense path)
    np.testing.assert_allclose(
        np.asarray(logits).reshape(M * B, S, cfg.n_vocab),
        np.asarray(rlog), rtol=0.05, atol=0.08)
