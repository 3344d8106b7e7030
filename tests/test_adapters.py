"""LoRA adapters + control vectors."""

import jax.numpy as jnp
import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.gguf.writer import GGUFWriter
from prima_tpu.models.adapters import (
    apply_control_vector,
    apply_lora,
    load_control_vector,
    load_lora_gguf,
)
from prima_tpu.models.config import tiny_config
from prima_tpu.models.llama import ForwardOptions, forward, init_kv_caches, synth_params
from prima_tpu.quant.dequant_jax import dequant

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

OPTS = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)


def _fwd(cfg, params, tokens):
    kv = init_kv_caches(cfg, 1, 32, jnp.float32)
    pos = np.arange(len(tokens), dtype=np.int32)[None]
    logits, _ = forward(params, cfg, np.asarray([tokens], np.int32), pos, kv,
                        np.zeros(1, np.int32), OPTS)
    return np.asarray(logits)


def _write_lora(path, cfg, rng, rank=4, alpha=8.0, layers=(0,)):
    w = GGUFWriter(path, arch="llama")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", alpha)
    tensors = {}
    for li in layers:
        a = (rng.standard_normal((rank, cfg.n_embd)) * 0.05).astype(np.float32)
        b = (rng.standard_normal((cfg.n_heads * cfg.head_dim, rank)) * 0.05).astype(np.float32)
        w.add_tensor(f"blk.{li}.attn_q.weight.lora_a", a)
        w.add_tensor(f"blk.{li}.attn_q.weight.lora_b", b)
        tensors[li] = (a, b)
    w.write()
    return tensors


def test_lora_matches_merged_weights(tmp_path):
    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    rng = np.random.default_rng(7)
    path = str(tmp_path / "adapter.gguf")
    tensors = _write_lora(path, cfg, rng, rank=4, alpha=8.0, layers=(0,))

    lora = load_lora_gguf(path, dtype=jnp.float32)
    lparams = apply_lora(params, lora)
    tokens = [3, 9, 4]
    got = _fwd(cfg, lparams, tokens)

    # reference: merge scale*B@A into a densified wq
    a, b = tensors[0]
    scale = 8.0 / 4
    w_base = np.asarray(dequant(params["layers"][0]["wq"], jnp.float32))
    merged = w_base + scale * (b @ a)
    mparams = dict(params)
    mlayers = list(params["layers"])
    ml0 = dict(mlayers[0])
    ml0["wq"] = jnp.asarray(merged)
    mlayers[0] = ml0
    mparams["layers"] = mlayers
    want = _fwd(cfg, mparams, tokens)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # without the adapter the logits differ
    base = _fwd(cfg, params, tokens)
    assert np.abs(base - got).max() > 1e-5


def test_control_vector(tmp_path):
    cfg = tiny_config(n_layers=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5)
    rng = np.random.default_rng(9)
    vec = rng.standard_normal(cfg.n_embd).astype(np.float32) * 0.1
    path = str(tmp_path / "cvec.gguf")
    w = GGUFWriter(path, arch="controlvector")
    w.add_tensor("direction.1", vec)  # applies to layer 0 (1-indexed)
    w.write()

    cv = load_control_vector(path, strength=2.0)
    cparams = apply_control_vector(params, cv)
    tokens = [3, 9, 4]
    got = _fwd(cfg, cparams, tokens)
    base = _fwd(cfg, params, tokens)
    assert np.abs(got - base).max() > 1e-4
    # strength 0 is a no-op
    cv0 = load_control_vector(path, strength=0.0)
    z = _fwd(cfg, apply_control_vector(params, cv0), tokens)
    np.testing.assert_allclose(z, base, rtol=1e-6, atol=1e-6)
