"""Host-orchestrated heterogeneous ring vs single-device reference."""

import jax
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
from prima_tpu.parallel.ring_host import HostRingExecutor, RingPlan
from prima_tpu.runtime.engine import Engine

OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


@pytest.mark.parametrize("windows,k", [
    ([3, 1], 1),
    pytest.param([1, 1], 2, marks=pytest.mark.slow),
    pytest.param([2, 1, 1], 1, marks=pytest.mark.slow),
])
def test_heterogeneous_ring_matches_reference(cpu_devices, windows, k):
    cfg = tiny_config(n_layers=sum(windows) * k)
    plan = RingPlan(windows=windows, k=k)
    ring = HostRingExecutor(
        cfg, plan,
        lambda i: synth_host_layer(cfg, i, GGMLType.Q4_K, seed=5),
        synth_host_head(cfg, GGMLType.Q4_K, seed=5),
        devices=cpu_devices, batch=1, max_seq=64, opts=OPTS, kv_dtype=jnp.float32,
    )
    prompt = [3, 17, 42, 7, 99, 5]
    got = ring.greedy_generate(prompt, 8)

    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    ref = Engine(cfg, params, n_slots=1, max_seq=64, n_batch=16, opts=OPTS,
                 kv_dtype=jnp.float32)
    want = ref.run_to_completion(prompt, n_predict=8)
    assert got == want


def test_params_actually_distributed(cpu_devices):
    cfg = tiny_config(n_layers=4)
    plan = RingPlan(windows=[3, 1], k=1)
    ring = HostRingExecutor(
        cfg, plan,
        lambda i: synth_host_layer(cfg, i, GGMLType.Q4_K, seed=5),
        synth_host_head(cfg, GGMLType.Q4_K, seed=5),
        devices=cpu_devices, batch=1, max_seq=32, opts=OPTS, kv_dtype=jnp.float32,
    )
    # device 0 holds 3 layers, device 1 holds 1
    assert len(ring.layers[0][0]) == 3
    assert len(ring.layers[1][0]) == 1
    d0 = ring.layers[0][0][0]["wq"].qs.devices().pop()
    d1 = ring.layers[1][0][0]["wq"].qs.devices().pop()
    assert d0 == cpu_devices[0] and d1 == cpu_devices[1]
