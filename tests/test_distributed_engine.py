"""Continuous batching over the piped-ring pipeline on the 8-device mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import (
    ForwardOptions,
    synth_host_head,
    synth_host_layer,
    synth_params,
)
from prima_tpu.parallel.engine import DistributedEngine
from prima_tpu.parallel.mesh import make_mesh
from prima_tpu.parallel.pipeline import PipeSpec, build_pipe_model
from prima_tpu.runtime.engine import Engine, SlotState

pytestmark = pytest.mark.slow  # multi-process/e2e tier (ci/run.sh --runslow)

OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


@pytest.fixture(scope="module")
def dist(cpu_devices):
    cfg = tiny_config(n_layers=4)
    mesh = make_mesh(dp=1, pp=2, tp=2)
    spec = PipeSpec.for_model(cfg, n_pp=2, n_tp=2, n_dp=1, k_cycles=2, microbatches=2)
    params = build_pipe_model(
        lambda i: synth_host_layer(cfg, i, GGMLType.Q4_K, seed=5),
        synth_host_head(cfg, GGMLType.Q4_K, seed=5),
        cfg, spec, mesh,
    )
    eng = DistributedEngine(cfg, params, spec, mesh, batch_per_micro=2,
                            max_seq=64, n_batch=16, opts=OPTS, kv_dtype=jnp.float32)
    ref_params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    ref = Engine(cfg, ref_params, n_slots=1, max_seq=64, n_batch=16, opts=OPTS,
                 kv_dtype=jnp.float32)
    return cfg, eng, ref


def test_distributed_matches_single_device(dist):
    cfg, eng, ref = dist
    prompt = [3, 17, 42, 7, 99, 5]
    got = eng.run_to_completion(prompt, n_predict=8)
    want = ref.run_to_completion(prompt, n_predict=8)
    assert got == want


def test_distributed_continuous_batching(dist):
    cfg, eng, ref = dist
    prompts = [[3, 17, 42, 7], [100, 20, 8, 55, 21], [9, 9, 9], [1, 2, 3, 4, 5]]
    slots = []
    # staggered joins across the 2x2 slot grid
    slots.append(eng.submit(prompts[0], n_predict=6, request_id=0))
    eng.step()
    slots.append(eng.submit(prompts[1], n_predict=6, request_id=1))
    slots.append(eng.submit(prompts[2], n_predict=6, request_id=2))
    eng.step()
    slots.append(eng.submit(prompts[3], n_predict=6, request_id=3))
    while any(s.state != SlotState.IDLE for s in slots):
        eng.step()
    for p, s in zip(prompts, slots):
        ref.slots[0].prompt = []  # defeat prefix reuse between cases
        want = ref.run_to_completion(p, n_predict=6, reuse_prefix=False)
        assert s.generated == want, f"prompt {p}"


def test_distributed_step_fused_matches_step(dist):
    """The chunked on-device path over the mesh pipeline produces the same
    greedy stream as the per-token host path (VERDICT r3 follow-through:
    the multi-chip serving fast path)."""
    cfg, eng, ref = dist
    prompt = [5, 11, 23, 4]
    want = eng.run_to_completion(prompt, n_predict=10, reuse_prefix=False)

    s = eng.submit(prompt, n_predict=10, reuse_prefix=False)
    got = []
    while s.state != SlotState.IDLE:
        for ev in eng.step_fused(max_chunk=4):
            if ev.token is not None:
                got.append(ev.token)
    assert got == want


def test_distributed_step_fused_seeded_dist(dist):
    """Seeded dist sampling through the distributed fused path reproduces
    and matches the distributed host path (device key schedule on both)."""
    from prima_tpu.sampling import Sampler, SamplerParams

    cfg, eng, ref = dist
    prompt = [2, 7, 19]
    p = SamplerParams(temp=0.9, top_k=24, top_p=0.9, seed=13)

    def fused_run():
        import dataclasses
        s = eng.submit(prompt, sampler=Sampler(dataclasses.replace(p)),
                       n_predict=8, reuse_prefix=False)
        out = []
        while s.state != SlotState.IDLE:
            for ev in eng.step_fused(max_chunk=3):
                if ev.token is not None:
                    out.append(ev.token)
        return out

    a = fused_run()
    b = fused_run()
    assert a == b  # reproducible across runs / chunkings
    import dataclasses
    s = eng.submit(prompt, sampler=Sampler(dataclasses.replace(p)),
                   n_predict=8, reuse_prefix=False)
    host = []
    while s.state != SlotState.IDLE:
        for ev in eng.step():
            if ev.token is not None:
                host.append(ev.token)
    assert host == a  # path invariance


def test_distributed_step_fused_concurrent_slots(dist):
    """Multiple slots advance together through the fused chunk loop."""
    cfg, eng, ref = dist
    prompts = [[3, 17, 42, 7], [100, 20, 8, 55, 21]]
    slots = [eng.submit(p, n_predict=6, request_id=i, reuse_prefix=False)
             for i, p in enumerate(prompts)]
    while any(s.state != SlotState.IDLE for s in slots):
        eng.step_fused(max_chunk=4)
    for p, s in zip(prompts, slots):
        ref.slots[0].prompt = []
        want = ref.run_to_completion(p, n_predict=6, reuse_prefix=False)
        assert s.generated == want, f"prompt {p}"
