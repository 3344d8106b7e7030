"""Arch-table extensions (VERDICT r1 'unported archs'): baichuan, refact,
plamo, codeshell, jais, chatglm, chameleon — GGUF-written tiny models vs
the independent numpy reference (the test-backend-ops comparison pattern).

Reference build functions: build_baichuan src/llama.cpp:11220 (13B ALiBi
branch @11271), build_refact @11945, build_plamo @13313, build_codeshell
@13522, build_jais @16163, build_chatglm @16255, build_chameleon @16734.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.gguf.reader import GGUFModel
from prima_tpu.gguf.writer import GGUFWriter
from prima_tpu.models.config import ModelConfig, RopeType
from prima_tpu.models.llama import (ForwardOptions, forward, init_kv_caches,
                                    load_params)
from prima_tpu.models.ref_numpy import forward_np

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

F32_OPTS = ForwardOptions(dtype=jnp.float32, logits_dtype=jnp.float32,
                          matmul_impl="xla")


def _write(path, arch, *, n_vocab=256, n_embd=64, n_heads=4, n_kv=4,
           n_ff=96, n_layers=2, fused_qkv=False, qkv_bias=False,
           ln_bias=False, ffn_bias=False, gate_bias=False, gated=True,
           split_up=False, qk_norms=False, swin=False, rope_dim=None,
           extra_kv=None, seed=0):
    rng = np.random.default_rng(seed)
    hd = n_embd // n_heads
    w = GGUFWriter(str(path), arch=arch)
    w.add_kv("general.name", f"tiny-{arch}")
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", n_kv)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.context_length", 512)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count",
             hd if rope_dim is None else rope_dim)
    for k, v in (extra_kv or {}).items():
        w.add_kv(k, v)
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(n_vocab)])

    dense = {}

    def add(name, rows, cols, scale=0.05):
        x = (rng.standard_normal((rows, cols)) * scale).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    def vec(name, n, around=1.0):
        x = (around + rng.standard_normal(n) * 0.05).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    add("token_embd.weight", n_vocab, n_embd)
    for i in range(n_layers):
        p = f"blk.{i}."
        vec(p + "attn_norm.weight", n_embd)
        if ln_bias:
            vec(p + "attn_norm.bias", n_embd, around=0.0)
        if fused_qkv:
            add(p + "attn_qkv.weight", (n_heads + 2 * n_kv) * hd, n_embd)
            vec(p + "attn_qkv.bias", (n_heads + 2 * n_kv) * hd, around=0.0)
        else:
            add(p + "attn_q.weight", n_heads * hd, n_embd)
            add(p + "attn_k.weight", n_kv * hd, n_embd)
            add(p + "attn_v.weight", n_kv * hd, n_embd)
            if qkv_bias:
                for nm, d in ((p + "attn_q.bias", n_heads * hd),
                              (p + "attn_k.bias", n_kv * hd),
                              (p + "attn_v.bias", n_kv * hd)):
                    vec(nm, d, around=0.0)
        if qk_norms:
            vec(p + "attn_q_norm.weight", hd)
            vec(p + "attn_q_norm.bias", hd, around=0.0)
            vec(p + "attn_k_norm.weight", hd)
            vec(p + "attn_k_norm.bias", hd, around=0.0)
        add(p + "attn_output.weight", n_embd, n_heads * hd)
        if ffn_bias:
            vec(p + "attn_output.bias", n_embd, around=0.0)
        if arch != "plamo":
            vec(p + "ffn_norm.weight", n_embd)
            if ln_bias:
                vec(p + "ffn_norm.bias", n_embd, around=0.0)
        if gated:
            add(p + "ffn_gate.weight", n_ff, n_embd)
            if gate_bias:
                vec(p + "ffn_gate.bias", n_ff, around=0.0)
        up_rows = 2 * n_ff if split_up else n_ff
        add(p + "ffn_up.weight", up_rows, n_embd)
        if ffn_bias:
            vec(p + "ffn_up.bias", up_rows, around=0.0)
        add(p + "ffn_down.weight", n_embd, n_ff)
        if ffn_bias:
            vec(p + "ffn_down.bias", n_embd, around=0.0)
    vec("output_norm.weight", n_embd)
    if ln_bias:
        vec("output_norm.bias", n_embd, around=0.0)
    add("output.weight", n_vocab, n_embd)
    w.write()
    return dense


CASES = {
    # arch -> (writer kwargs, expected config checks)
    "baichuan": (dict(), {"rope_type": RopeType.NORM, "alibi_max_bias": 0.0}),
    "refact": (dict(), {"rope_dim": 0, "alibi_max_bias": 8.0}),
    "plamo": (dict(), {"parallel_block": True, "rope_type": RopeType.NORM}),
    "codeshell": (dict(fused_qkv=True, ln_bias=True, ffn_bias=True,
                       gated=False),
                  {"norm_type": "ln", "ffn_gated": False, "act": "gelu"}),
    "jais": (dict(fused_qkv=True, ln_bias=True, ffn_bias=True,
                  gate_bias=True),
             {"rope_dim": 0, "alibi_max_bias": 8.0, "norm_type": "ln"}),
    "chatglm": (dict(fused_qkv=True, gated=False, split_up=True,
                     rope_dim=8),
                {"act": "swiglu_split", "rope_type": RopeType.NORM}),
    "chameleon": (dict(qk_norms=True),
                  {"qk_norm_head": True, "swin_norm": False}),
}


@pytest.mark.parametrize("arch", sorted(CASES))
def test_new_arch_matches_numpy(tmp_path, arch):
    kwargs, checks = CASES[arch]
    path = tmp_path / f"{arch}.gguf"
    dense = _write(path, arch, **kwargs)
    m = GGUFModel.open(str(path))
    cfg = ModelConfig.from_gguf(m)
    assert cfg.arch == arch
    for key, val in checks.items():
        assert getattr(cfg, key) == val, key
    params = load_params(m, cfg, dtype=jnp.float32)

    b, s = 2, 7
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.n_vocab, size=(b, s)).astype(np.int32)
    want = forward_np(dense, cfg, tokens)

    positions = np.broadcast_to(np.arange(s, dtype=np.int32), (b, s))
    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    logits, _ = forward(params, cfg, jnp.asarray(tokens),
                        jnp.asarray(positions), kv,
                        jnp.zeros(b, jnp.int32), F32_OPTS)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-3, atol=2e-3)


def test_baichuan_13b_alibi_variant(tmp_path):
    """n_layers >= 40 flips Baichuan to the ALiBi/no-rope branch — write a
    40-layer-KV GGUF with 2 real layers is impossible, so check the config
    rule directly and run a 40-layer 1-embd... instead: config-only."""
    path = tmp_path / "b13.gguf"
    # writing 40 tiny layers is cheap at these dims
    dense = _write(path, "baichuan", n_layers=40, n_embd=32, n_heads=2,
                   n_kv=2, n_ff=48, n_vocab=64)
    m = GGUFModel.open(str(path))
    cfg = ModelConfig.from_gguf(m)
    assert cfg.alibi_max_bias == 8.0 and cfg.rope_dim == 0
    params = load_params(m, cfg, dtype=jnp.float32)
    b, s = 1, 5
    tokens = np.asarray([[3, 9, 20, 7, 1]], np.int32)
    want = forward_np(dense, cfg, tokens)
    positions = np.broadcast_to(np.arange(s, dtype=np.int32), (b, s))
    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    logits, _ = forward(params, cfg, jnp.asarray(tokens),
                        jnp.asarray(positions), kv,
                        jnp.zeros(b, jnp.int32), F32_OPTS)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-3, atol=2e-3)


def test_chameleon_swin_norm_variant(tmp_path):
    path = tmp_path / "cham_swin.gguf"
    dense = _write(path, "chameleon", qk_norms=True,
                   extra_kv={"chameleon.swin_norm": True})
    m = GGUFModel.open(str(path))
    cfg = ModelConfig.from_gguf(m)
    assert cfg.swin_norm is True
    params = load_params(m, cfg, dtype=jnp.float32)
    b, s = 1, 6
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.n_vocab, size=(b, s)).astype(np.int32)
    want = forward_np(dense, cfg, tokens)
    positions = np.broadcast_to(np.arange(s, dtype=np.int32), (b, s))
    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    logits, _ = forward(params, cfg, jnp.asarray(tokens),
                        jnp.asarray(positions), kv,
                        jnp.zeros(b, jnp.int32), F32_OPTS)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-3, atol=2e-3)


def _write_moe(path, arch, *, n_vocab=256, n_embd=64, n_heads=4, n_kv=4,
               n_ff=96, n_layers=2, n_expert=2, n_expert_used=2,
               dense_too=False, post_norms=False, seed=0, extra_kv=None):
    rng = np.random.default_rng(seed)
    hd = n_embd // n_heads
    w = GGUFWriter(str(path), arch=arch)
    w.add_kv("general.name", f"tiny-{arch}")
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", n_kv)
    w.add_kv(f"{arch}.feed_forward_length", n_ff)
    w.add_kv(f"{arch}.context_length", 512)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", hd)
    w.add_kv(f"{arch}.expert_count", n_expert)
    w.add_kv(f"{arch}.expert_used_count", n_expert_used)
    for k, v in (extra_kv or {}).items():
        w.add_kv(k, v)
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(n_vocab)])

    dense = {}

    def add(name, rows, cols, scale=0.05):
        x = (rng.standard_normal((rows, cols)) * scale).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    def vec(name, n, around=1.0):
        x = (around + rng.standard_normal(n) * 0.05).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    add("token_embd.weight", n_vocab, n_embd)
    for i in range(n_layers):
        p = f"blk.{i}."
        vec(p + "attn_norm.weight", n_embd)
        add(p + "attn_q.weight", n_heads * hd, n_embd)
        add(p + "attn_k.weight", n_kv * hd, n_embd)
        add(p + "attn_v.weight", n_kv * hd, n_embd)
        add(p + "attn_output.weight", n_embd, n_heads * hd)
        vec(p + "ffn_norm.weight", n_embd)
        add(p + "ffn_gate_inp.weight", n_expert, n_embd)
        add(p + "ffn_gate_exps.weight", n_expert * n_ff, n_embd)
        add(p + "ffn_up_exps.weight", n_expert * n_ff, n_embd)
        add(p + "ffn_down_exps.weight", n_expert * n_embd, n_ff)
        if dense_too:
            add(p + "ffn_gate.weight", n_ff, n_embd)
            add(p + "ffn_up.weight", n_ff, n_embd)
            add(p + "ffn_down.weight", n_embd, n_ff)
            vec(p + "ffn_norm_exps.weight", n_embd)
        if post_norms:
            vec(p + "attn_out_norm.weight", n_embd)
            vec(p + "layer_out_norm.weight", n_embd)
    vec("output_norm.weight", n_embd)
    add("output.weight", n_vocab, n_embd)
    w.write()
    return dense


@pytest.mark.parametrize("arch", ["grok", "arctic"])
def test_moe_archs_match_numpy(tmp_path, arch):
    """grok (softcapped attention, scaled embeddings, GELU MoE, post
    norms) and arctic (dense FFN + parallel MoE) vs the numpy reference."""
    path = tmp_path / f"{arch}.gguf"
    dense = _write_moe(path, arch, dense_too=arch == "arctic",
                       post_norms=arch == "grok")
    m = GGUFModel.open(str(path))
    cfg = ModelConfig.from_gguf(m)
    assert cfg.arch == arch
    if arch == "grok":
        assert cfg.attn_logit_softcap == 30.0 and cfg.post_norms
    else:
        assert cfg.moe_parallel_dense
    params = load_params(m, cfg, dtype=jnp.float32)

    b, s = 1, 6
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.n_vocab, size=(b, s)).astype(np.int32)
    want = forward_np(dense, cfg, tokens)
    positions = np.broadcast_to(np.arange(s, dtype=np.int32), (b, s))
    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    logits, _ = forward(params, cfg, jnp.asarray(tokens),
                        jnp.asarray(positions), kv,
                        jnp.zeros(b, jnp.int32), F32_OPTS)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=3e-3, atol=3e-3)


def test_openelm_matches_numpy(tmp_path):
    """OpenELM: per-layer head/kv/ffn widths (array-valued KVs), fused qkv,
    per-head RMS q/k norms before NEOX rope, tied lm_head
    (build_openelm src/llama.cpp:15049, loader @8797)."""
    arch = "openelm"
    n_vocab, n_embd, hd, n_layers = 128, 64, 16, 3
    heads = [2, 3, 4]
    kv_heads = [1, 1, 2]
    ffs = [48, 64, 96]
    rng = np.random.default_rng(7)
    path = tmp_path / "openelm.gguf"
    w = GGUFWriter(str(path), arch=arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", n_embd)
    w.add_kv(f"{arch}.attention.head_count", heads)
    w.add_kv(f"{arch}.attention.head_count_kv", kv_heads)
    w.add_kv(f"{arch}.feed_forward_length", ffs)
    w.add_kv(f"{arch}.context_length", 512)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv(f"{arch}.attention.key_length", hd)
    w.add_kv(f"{arch}.attention.value_length", hd)
    w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    w.add_kv(f"{arch}.rope.dimension_count", hd)
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(n_vocab)])

    dense = {}

    def add(name, rows, cols, scale=0.05):
        x = (rng.standard_normal((rows, cols)) * scale).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    def vec(name, n, around=1.0):
        x = (around + rng.standard_normal(n) * 0.05).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    add("token_embd.weight", n_vocab, n_embd)
    for i in range(n_layers):
        p = f"blk.{i}."
        h, kvh, nf = heads[i], kv_heads[i], ffs[i]
        vec(p + "attn_norm.weight", n_embd)
        add(p + "attn_qkv.weight", (h + 2 * kvh) * hd, n_embd)
        vec(p + "attn_q_norm.weight", hd)
        vec(p + "attn_k_norm.weight", hd)
        add(p + "attn_output.weight", n_embd, h * hd)
        vec(p + "ffn_norm.weight", n_embd)
        add(p + "ffn_gate.weight", nf, n_embd)
        add(p + "ffn_up.weight", nf, n_embd)
        add(p + "ffn_down.weight", n_embd, nf)
    vec("output_norm.weight", n_embd)
    w.write()

    m = GGUFModel.open(str(path))
    cfg = ModelConfig.from_gguf(m)
    assert cfg.arch == arch
    assert cfg.n_heads_arr == tuple(heads)
    assert cfg.n_kv_heads_arr == tuple(kv_heads)
    assert cfg.n_ff_arr == tuple(ffs)
    assert cfg.qk_norm_rms and cfg.qk_norm_head
    assert cfg.rope_type == RopeType.NEOX
    assert cfg.tie_embeddings
    params = load_params(m, cfg, dtype=jnp.float32)

    b, s = 2, 6
    tokens = rng.integers(0, n_vocab, size=(b, s)).astype(np.int32)
    want = forward_np(dense, cfg, tokens)
    positions = np.broadcast_to(np.arange(s, dtype=np.int32), (b, s))
    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    assert kv[0][0].shape[2] == 1 and kv[2][0].shape[2] == 2
    logits, _ = forward(params, cfg, jnp.asarray(tokens),
                        jnp.asarray(positions), kv,
                        jnp.zeros(b, jnp.int32), F32_OPTS)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-3, atol=2e-3)


def test_bitnet_matches_numpy(tmp_path):
    """BitNet: per-tensor .scale multipliers, RMS sub-norms before the
    attention output projection and before ffn_down, tied lm_head
    (build_bitnet src/llama.cpp:15676, loader @8977)."""
    arch = "bitnet"
    n_vocab, n_embd, n_heads, n_kv, n_ff, n_layers = 128, 64, 4, 2, 96, 2
    hd = n_embd // n_heads
    rng = np.random.default_rng(11)
    path = tmp_path / "bitnet.gguf"
    w = GGUFWriter(str(path), arch=arch)
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

    def add(name, rows, cols, scale=0.05):
        x = (rng.standard_normal((rows, cols)) * scale).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    def vec(name, n, around=1.0):
        x = (around + rng.standard_normal(n) * 0.05).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    add("token_embd.weight", n_vocab, n_embd)
    for i in range(n_layers):
        p = f"blk.{i}."
        vec(p + "attn_norm.weight", n_embd)
        vec(p + "attn_sub_norm.weight", n_heads * hd)
        add(p + "attn_q.weight", n_heads * hd, n_embd)
        vec(p + "attn_q.scale", 1, around=1.2)
        add(p + "attn_k.weight", n_kv * hd, n_embd)
        vec(p + "attn_k.scale", 1, around=0.9)
        add(p + "attn_v.weight", n_kv * hd, n_embd)
        vec(p + "attn_v.scale", 1, around=1.1)
        add(p + "attn_output.weight", n_embd, n_heads * hd)
        vec(p + "attn_output.scale", 1, around=0.8)
        vec(p + "ffn_norm.weight", n_embd)
        vec(p + "ffn_sub_norm.weight", n_ff)
        add(p + "ffn_gate.weight", n_ff, n_embd)
        vec(p + "ffn_gate.scale", 1, around=1.3)
        add(p + "ffn_up.weight", n_ff, n_embd)
        vec(p + "ffn_up.scale", 1, around=0.7)
        add(p + "ffn_down.weight", n_embd, n_ff)
        vec(p + "ffn_down.scale", 1, around=1.4)
    vec("output_norm.weight", n_embd)
    w.write()

    m = GGUFModel.open(str(path))
    cfg = ModelConfig.from_gguf(m)
    assert cfg.arch == arch and cfg.sub_norms and cfg.tie_embeddings
    assert cfg.rope_type == RopeType.NEOX
    params = load_params(m, cfg, dtype=jnp.float32)
    assert params["layers"][0]["wq_scale"] is not None

    b, s = 1, 6
    tokens = rng.integers(0, n_vocab, size=(b, s)).astype(np.int32)
    want = forward_np(dense, cfg, tokens)
    positions = np.broadcast_to(np.arange(s, dtype=np.int32), (b, s))
    kv = init_kv_caches(cfg, b, 16, dtype=jnp.float32)
    logits, _ = forward(params, cfg, jnp.asarray(tokens),
                        jnp.asarray(positions), kv,
                        jnp.zeros(b, jnp.int32), F32_OPTS)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-3, atol=2e-3)
