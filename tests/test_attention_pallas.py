"""Flash attention kernel vs the XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from prima_tpu.ops.attention_pallas import flash_attention
from prima_tpu.ops.layers import causal_mask, gqa_attention


@pytest.mark.parametrize("b,s,t,h,kvh,d", [
    (1, 1, 128, 8, 2, 64),    # decode step
    (2, 16, 64, 4, 4, 32),    # prefill, MHA
    (1, 8, 256, 8, 2, 64),    # prefill, GQA, multiple kv blocks
])
def test_flash_matches_xla(b, s, t, h, kvh, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, kvh, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, kvh, d)).astype(np.float32))
    pos0 = 20
    positions = jnp.asarray(np.arange(pos0, pos0 + s, dtype=np.int32)[None]
                            .repeat(b, axis=0))
    scale = 1.0 / np.sqrt(d)
    mask = causal_mask(positions, t)
    want = np.asarray(gqa_attention(q, k, v, mask, scale))
    got = np.asarray(flash_attention(q, k, v, positions, scale))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_forward_with_pallas_attention():
    """Full model forward with attn_impl=pallas matches xla."""
    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.config import tiny_config
    from prima_tpu.models.llama import ForwardOptions, forward, init_kv_caches, synth_params

    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    tokens = np.asarray([[3, 9, 4, 17]], np.int32)
    pos = np.arange(4, dtype=np.int32)[None]

    def run(attn):
        kv = init_kv_caches(cfg, 1, 32, jnp.float32)
        opts = ForwardOptions(matmul_impl="xla", attn_impl=attn, dtype=jnp.float32)
        logits, _ = forward(params, cfg, tokens, pos, kv, np.zeros(1, np.int32), opts)
        return np.asarray(logits)

    np.testing.assert_allclose(run("pallas"), run("xla"), rtol=2e-4, atol=2e-4)
