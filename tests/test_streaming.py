"""Weight streaming: host-resident layers produce identical results."""

import jax.numpy as jnp
import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import ForwardOptions, synth_host_head, synth_host_layer, synth_params
from prima_tpu.runtime.engine import Engine
from prima_tpu.runtime.streaming import StreamedRunner, build_streamed_model

pytestmark = pytest.mark.slow  # multi-process/e2e tier (ci/run.sh --runslow)

OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


@pytest.mark.parametrize("n_resident", [0, 2, 4])
def test_streamed_matches_resident(n_resident):
    cfg = tiny_config(n_layers=4)
    model = build_streamed_model(
        lambda i: synth_host_layer(cfg, i, GGMLType.Q4_K, seed=5),
        synth_host_head(cfg, GGMLType.Q4_K, seed=5),
        cfg, n_resident=n_resident,
    )
    runner = StreamedRunner(model, batch=1, max_seq=64, opts=OPTS,
                            kv_dtype=jnp.float32)
    prompt = [3, 17, 42, 7, 99, 5]
    got = runner.greedy_generate(prompt, 8)

    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    eng = Engine(cfg, params, n_slots=1, max_seq=64, n_batch=16, opts=OPTS,
                 kv_dtype=jnp.float32)
    want = eng.run_to_completion(prompt, n_predict=8)
    assert got == want
