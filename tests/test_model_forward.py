"""Model forward parity: GGUF -> JAX forward vs independent numpy reference,
plus prefill-vs-incremental-decode consistency and pipeline-window splitting."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.gguf.writer import GGUFWriter
from prima_tpu.gguf.reader import GGUFModel
from prima_tpu.models.config import ModelConfig, tiny_config
from prima_tpu.models.llama import (
    ForwardOptions,
    forward,
    init_kv_caches,
    load_params,
)
from prima_tpu.models.ref_numpy import forward_np
from prima_tpu.quant.quantize_np import quantize
from prima_tpu.quant.dequant_np import dequantize


def make_tiny_gguf(path, arch="llama", n_vocab=256, n_embd=256, n_heads=4, n_kv=2,
                   n_ff=256, n_layers=2, wtype=GGMLType.Q4_K, seed=0):
    """Write a tiny random-weight GGUF; returns dense f32 weights dict."""
    rng = np.random.default_rng(seed)
    hd = n_embd // n_heads
    w = GGUFWriter(str(path), arch=arch)
    w.add_kv("general.name", "tiny-test")
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", n_kv)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.context_length", 512)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", hd)
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(n_vocab)])

    dense = {}

    def add(name, rows, cols, t=wtype, scale=0.05):
        x = (rng.standard_normal((rows, cols)) * scale).astype(np.float32)
        if t is None:
            w.add_tensor(name, x)
            dense[name] = x
        else:
            raw = quantize(x, t)
            w.add_tensor(name, raw, ne=(cols, rows), ggml_type=t)
            dense[name] = dequantize(raw, t, cols).reshape(rows, cols)

    def add_vec(name, n):
        x = (1.0 + rng.standard_normal(n) * 0.05).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    add("token_embd.weight", n_vocab, n_embd)
    for i in range(n_layers):
        p = f"blk.{i}."
        add_vec(p + "attn_norm.weight", n_embd)
        add(p + "attn_q.weight", n_heads * hd, n_embd)
        add(p + "attn_k.weight", n_kv * hd, n_embd)
        add(p + "attn_v.weight", n_kv * hd, n_embd)
        add(p + "attn_output.weight", n_embd, n_heads * hd)
        add_vec(p + "ffn_norm.weight", n_embd)
        add(p + "ffn_gate.weight", n_ff, n_embd)
        add(p + "ffn_up.weight", n_ff, n_embd)
        add(p + "ffn_down.weight", n_embd, n_ff)
        if arch == "qwen2":
            for nm, dim in (("attn_q.bias", n_heads * hd), ("attn_k.bias", n_kv * hd), ("attn_v.bias", n_kv * hd)):
                x = (rng.standard_normal(dim) * 0.02).astype(np.float32)
                w.add_tensor(p + nm, x)
                dense[p + nm] = x
    add_vec("output_norm.weight", n_embd)
    add("output.weight", n_vocab, n_embd)
    w.write()
    return dense


F32_OPTS = ForwardOptions(dtype=jnp.float32, logits_dtype=jnp.float32)


@pytest.mark.parametrize("arch", ["llama", "qwen2", "internlm2", "minicpm",
                                  "xverse", "exaone", "orion"])
def test_forward_matches_numpy(tmp_path, arch):
    """internlm2 = llama numerics under another arch name; minicpm adds the
    embd/residual/logit scaling knobs (both verified against the scale-aware
    numpy reference)."""
    path = tmp_path / "tiny.gguf"
    dense = make_tiny_gguf(path, arch=arch)
    m = GGUFModel.open(path)
    cfg = ModelConfig.from_gguf(m)
    assert cfg.arch == arch
    params = load_params(m, cfg, dtype=jnp.float32)

    b, s = 2, 7
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.n_vocab, size=(b, s)).astype(np.int32)
    want = forward_np(dense, cfg, tokens)

    positions = np.broadcast_to(np.arange(s, dtype=np.int32), (b, s))
    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    logits, _ = forward(
        params, cfg, jnp.asarray(tokens), jnp.asarray(positions), kv,
        jnp.zeros(b, jnp.int32), F32_OPTS,
    )
    got = np.asarray(logits)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_incremental_decode_matches_prefill(tmp_path):
    path = tmp_path / "tiny.gguf"
    make_tiny_gguf(path)
    m = GGUFModel.open(path)
    cfg = ModelConfig.from_gguf(m)
    params = load_params(m, cfg, dtype=jnp.float32)

    b, s = 1, 6
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, size=(b, s)).astype(np.int32))
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))

    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    full_logits, _ = forward(params, cfg, tokens, positions, kv, jnp.zeros(b, jnp.int32), F32_OPTS)

    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    step_logits = []
    for t in range(s):
        lg, kv = forward(
            params, cfg, tokens[:, t : t + 1],
            positions[:, t : t + 1], kv,
            jnp.full((b,), t, jnp.int32), F32_OPTS,
        )
        step_logits.append(np.asarray(lg)[:, 0])
    got = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(got, np.asarray(full_logits), rtol=1e-4, atol=1e-4)


def test_pipeline_windows_match_full(tmp_path):
    """Running layers as two windows with a hidden handoff equals the full pass."""
    path = tmp_path / "tiny.gguf"
    make_tiny_gguf(path)
    m = GGUFModel.open(path)
    cfg = ModelConfig.from_gguf(m)
    params = load_params(m, cfg, dtype=jnp.float32)

    b, s = 1, 5
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, size=(b, s)).astype(np.int32))
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    cache_pos = jnp.zeros(b, jnp.int32)

    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    full_logits, _ = forward(params, cfg, tokens, positions, kv, cache_pos, F32_OPTS)

    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    hidden, kv = forward(params, cfg, tokens, positions, kv, cache_pos, F32_OPTS,
                         layer_range=(0, 1))
    logits2, kv = forward(params, cfg, tokens, positions, kv, cache_pos, F32_OPTS,
                          layer_range=(1, cfg.n_layers), hidden_in=hidden)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(full_logits), rtol=1e-5, atol=1e-5)


def test_synth_params_forward():
    from prima_tpu.models.llama import synth_params

    cfg = tiny_config()
    params = synth_params(cfg)
    b, s = 2, 3
    tokens = jnp.zeros((b, s), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    kv = init_kv_caches(cfg, b, 8)
    logits, kv2 = forward(params, cfg, tokens, positions, kv, jnp.zeros(b, jnp.int32))
    assert logits.shape == (b, s, cfg.n_vocab)
    assert np.isfinite(np.asarray(logits)).all()


def test_forward_scan_matches_forward():
    """The lax.scan fast-compile path produces the same logits as the
    layer-indexable forward."""
    import jax

    from prima_tpu.models.llama import (
        forward, forward_scan, init_kv_caches, init_kv_stacked,
        synth_params_device_stacked,
    )

    cfg = tiny_config(n_layers=3, n_embd=256, n_heads=4, n_kv_heads=2,
                      head_dim=64, n_ff=512, n_vocab=512, rope_dim=64)
    opts = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)
    stacked = jax.jit(lambda: synth_params_device_stacked(cfg, GGMLType.Q4_K))()

    # unstack into the list-of-layers form for the reference forward
    unstacked = {
        "tok_embd": stacked["tok_embd"],
        "output_norm": stacked["output_norm"],
        "output": stacked["output"],
        "layers": [
            jax.tree.map(lambda a: a[i], stacked["layers"])
            for i in range(cfg.n_layers)
        ],
    }
    toks = np.array([[3, 17, 42, 7]], np.int32)
    pos = np.arange(4, dtype=np.int32)[None]
    zero = np.zeros(1, np.int32)

    kv_l = init_kv_caches(cfg, 1, 16, jnp.float32)
    ref, _ = forward(unstacked, cfg, toks, pos, kv_l, zero, opts)

    kv_s = init_kv_stacked(cfg, 1, 16, jnp.float32)
    got, kv_out = forward_scan(stacked, cfg, toks, pos, kv_s, zero, opts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert kv_out[0].shape[0] == cfg.n_layers


@pytest.mark.parametrize("arch", ["llama", "qwen2"])
def test_fused_load_matches_unfused(tmp_path, arch):
    """load_params(fuse=True) concatenates Q/K/V and gate/up at the raw
    quant-block level; logits must match the unfused load exactly (same
    dequant, same math — only the launch count changes). qwen2 covers the
    qkv-bias case (biases are applied after the fused split)."""
    path = tmp_path / "tiny.gguf"
    make_tiny_gguf(path, arch=arch)
    m = GGUFModel.open(path)
    cfg = ModelConfig.from_gguf(m)
    params = load_params(m, cfg, dtype=jnp.float32)
    fused = load_params(m, cfg, dtype=jnp.float32, fuse=True)
    assert fused["layers"][0].get("wqkv") is not None
    assert fused["layers"][0].get("w_gateup") is not None

    b, s = 2, 5
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (b, s)).astype(np.int32))
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    zero = jnp.zeros(b, jnp.int32)

    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    want, _ = forward(params, cfg, tokens, positions, kv, zero, F32_OPTS)
    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    got, _ = forward(fused, cfg, tokens, positions, kv, zero, F32_OPTS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
