"""Streaming x piped-ring composition (parallel/streamed_pipe.py).

VERDICT r1 item 2: an 8-virtual-device pipeline with n_resident < W must
produce logits identical to the fully-resident run — the TPU analogue of
manage_graph_tensors inside the k-cycle ring (src/llama.cpp:18152-18218,
18567-18575).
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
from prima_tpu.parallel.pipeline import PipeSpec, init_pipe_kv
from prima_tpu.parallel.streamed_pipe import (StreamedPipeRunner,
                                              build_streamed_pipe_model)
from prima_tpu.quant.dequant_jax import QTensor

pytestmark = pytest.mark.slow  # multi-process/e2e tier (ci/run.sh --runslow)

GG = GGMLType.Q4_K
OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


def _reference_logits(cfg, tokens, positions, cache_pos, max_seq, seed=0):
    def conv(t):
        if t is None:
            return None
        if hasattr(t, "ggml_type"):
            return QTensor.from_host(t)
        return jax.device_put(np.asarray(t))

    head = synth_host_head(cfg, GG, seed)
    params = {
        "tok_embd": conv(head["tok_embd"]),
        "layers": [
            {k: conv(v) for k, v in synth_host_layer(cfg, i, GG, seed).items()}
            for i in range(cfg.n_layers)
        ],
        "output_norm": conv(head["output_norm"]),
        "output": conv(head["output"]),
    }
    kv = init_kv_caches(cfg, tokens.shape[0], max_seq, jnp.float32)
    logits, kv = forward(params, cfg, tokens, positions, kv, cache_pos, OPTS)
    return logits


def _runner(cfg, mesh, spec, n_resident, B, T, seed=0):
    model = build_streamed_pipe_model(
        lambda i: synth_host_layer(cfg, i, GG, seed),
        synth_host_head(cfg, GG, seed),
        cfg, spec, mesh, n_resident,
    )
    return StreamedPipeRunner(model, B, T, OPTS)


@pytest.mark.parametrize("dp,pp,tp,k,n_res", [
    (1, 4, 1, 2, 1),   # W=1? no: L=8 -> W = 8/(4*2) = 1, n_res must be <= 1
    (1, 2, 2, 2, 0),   # all-streamed windows
    (2, 2, 1, 2, 1),   # dp replication of streamed rows
    (1, 4, 2, 1, 1),   # k=1: static streamed row
])
def test_streamed_pipe_matches_single_device(cpu_devices, dp, pp, tp, k, n_res):
    n_layers = 8
    cfg = tiny_config(n_layers=n_layers)
    mesh = make_mesh(dp=dp, pp=pp, tp=tp)
    M = pp
    B, S, T = 2, 4, 16
    spec = PipeSpec.for_model(cfg, n_pp=pp, n_tp=tp, n_dp=dp, k_cycles=k,
                              microbatches=M)
    assert n_res < spec.window or spec.window == n_res
    runner = _runner(cfg, mesh, spec, n_res, B, T)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.n_vocab, size=(M, B, S)).astype(np.int32)
    positions = np.broadcast_to(np.arange(S, dtype=np.int32), (M, B, S)).copy()
    cache_pos = np.zeros((M, B), np.int32)

    logits = runner.forward(tokens, positions, cache_pos)
    assert logits.shape == (M, B, S, cfg.n_vocab)

    ref = _reference_logits(cfg, tokens.reshape(M * B, S),
                            positions.reshape(M * B, S),
                            cache_pos.reshape(M * B), T)
    np.testing.assert_allclose(
        np.asarray(logits).reshape(M * B, S, cfg.n_vocab),
        np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_streamed_pipe_decode_steps(cpu_devices):
    """Prefill + two decode steps: KV carried across host-driven steps, and
    the streamed rows cycle back to window 0 between tokens."""
    n_layers = 8
    cfg = tiny_config(n_layers=n_layers)
    pp, k, n_res = 2, 2, 1  # W = 2, 1 resident + 1 streamed per window
    mesh = make_mesh(dp=1, pp=pp, tp=1)
    M = pp
    B, S, T = 1, 4, 16
    spec = PipeSpec.for_model(cfg, n_pp=pp, n_tp=1, n_dp=1, k_cycles=k,
                              microbatches=M)
    runner = _runner(cfg, mesh, spec, n_res, B, T)

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.n_vocab, size=(M, B, S)).astype(np.int32)
    positions = np.broadcast_to(np.arange(S, dtype=np.int32), (M, B, S)).copy()
    cache_pos = np.zeros((M, B), np.int32)
    logits = runner.forward(tokens, positions, cache_pos)
    nxt = np.asarray(jnp.argmax(logits[:, :, -1], axis=-1))  # (M, B)

    # single-device reference, same trajectory
    ref0 = _reference_logits(cfg, tokens.reshape(M * B, S),
                             positions.reshape(M * B, S),
                             cache_pos.reshape(M * B), T)
    ref_nxt = np.asarray(jnp.argmax(ref0[:, -1], axis=-1)).reshape(M, B)
    np.testing.assert_array_equal(nxt, ref_nxt)

    seqs = [tokens.reshape(M * B, S)]
    for step in range(2):
        cache_pos_step = np.full((M, B), S + step, np.int32)
        pos_step = cache_pos_step[..., None]
        logits = runner.forward(nxt[..., None].astype(np.int32), pos_step,
                                cache_pos_step)
        nxt = np.asarray(jnp.argmax(logits[:, :, -1], axis=-1))
        seqs.append(nxt.reshape(M * B, 1))

    # reference trajectory on the full growing sequence (teacher-forced)
    full = np.concatenate(seqs[:-1], axis=1)
    pos_full = np.broadcast_to(np.arange(full.shape[1], dtype=np.int32),
                               full.shape).copy()
    ref_full = _reference_logits(cfg, full, pos_full,
                                 np.zeros(M * B, np.int32), T)
    ref_last = np.asarray(jnp.argmax(ref_full[:, -1], axis=-1))
    np.testing.assert_array_equal(nxt.reshape(-1), ref_last)
