"""Pallas kernels INSIDE the multi-device shard_map planes (VERDICT r3
task 8).

The dryrun and the other pipe/TP/SP parity tests run matmul_impl="xla";
these run the SAME parity checks with the fused Pallas dequant-matmul
(interpret mode on the virtual CPU mesh), so the qmatmul/flash kernels
are validated inside shard_map partitions before a real pod ever runs
them. Numerics: the Pallas kernel and the XLA dequant path share block
layouts, so tolerances match the plain parity tests.
"""

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
REF_OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


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


def _run_plane(cfg, mesh, spec, opts, M, B, S, T, sp=None):
    params = build_pipe_model(
        lambda i: synth_host_layer(cfg, i, GG, 0),
        synth_host_head(cfg, GG, 0), cfg, spec, mesh)
    fwd = jax.jit(make_pipe_forward(cfg, spec, mesh, opts))
    kv = init_pipe_kv(cfg, spec, mesh, B, T, jnp.float32,
                      seq_shards=sp)
    rng = np.random.default_rng(7)
    tokens = rng.integers(0, cfg.n_vocab, size=(M, B, S)).astype(np.int32)
    positions = np.broadcast_to(np.arange(S, dtype=np.int32),
                                (M, B, S)).copy()
    cache_pos = np.zeros((M, B), np.int32)
    logits, kv = fwd(params, tokens, positions, cache_pos, kv)
    return tokens, positions, cache_pos, np.asarray(logits)


@pytest.mark.parametrize("pp,tp,k", [
    (2, 2, 1),
    pytest.param(2, 1, 2, marks=pytest.mark.slow),
    pytest.param(4, 2, 1, marks=pytest.mark.slow),
])
def test_pipeline_parity_with_pallas_matmul(cpu_devices, pp, tp, k):
    """Piped-ring plane with the fused Pallas dequant-GEMM inside every
    shard_map partition."""
    cfg = tiny_config(n_layers=4)
    dp = 8 // (pp * tp) if pp * tp < 8 else 1
    mesh = make_mesh(dp=dp, pp=pp, tp=tp)
    M, B, S, T = pp, max(2, dp), 4, 16  # global batch must divide dp
    spec = PipeSpec.for_model(cfg, n_pp=pp, n_tp=tp, n_dp=dp, k_cycles=k,
                              microbatches=M)
    opts = ForwardOptions(matmul_impl="pallas", dtype=jnp.float32)
    tokens, positions, cache_pos, logits = _run_plane(
        cfg, mesh, spec, opts, M, B, S, T)

    refp = _single_device_params(cfg)
    rkv = init_kv_caches(cfg, M * B, T, jnp.float32)
    rlog, _ = forward(refp, cfg, tokens.reshape(M * B, S),
                      positions.reshape(M * B, S), rkv,
                      cache_pos.reshape(M * B), REF_OPTS)
    np.testing.assert_allclose(
        logits.reshape(M * B, S, cfg.n_vocab), np.asarray(rlog),
        rtol=5e-3, atol=5e-3)


def test_seq_parallel_parity_with_pallas_matmul(cpu_devices):
    """sp-sharded attention plane with Pallas matmuls in the partitions."""
    cfg = tiny_config(n_layers=2)
    mesh = make_mesh(dp=1, pp=2, sp=2, tp=2)
    M, B, S, T = 2, 2, 8, 32
    spec = PipeSpec.for_model(cfg, n_pp=2, n_tp=2, n_dp=1, k_cycles=1,
                              microbatches=M, n_sp=2)
    opts = ForwardOptions(matmul_impl="pallas", dtype=jnp.float32)
    tokens, positions, cache_pos, logits = _run_plane(
        cfg, mesh, spec, opts, M, B, S, T, sp=2)

    refp = _single_device_params(cfg)
    rkv = init_kv_caches(cfg, M * B, T, jnp.float32)
    rlog, _ = forward(refp, cfg, tokens.reshape(M * B, S),
                      positions.reshape(M * B, S), rkv,
                      cache_pos.reshape(M * B), REF_OPTS)
    np.testing.assert_allclose(
        logits.reshape(M * B, S, cfg.n_vocab), np.asarray(rlog),
        rtol=5e-3, atol=5e-3)
