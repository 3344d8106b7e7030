"""HF -> GGUF conversion for the remote-code archs (convert_extra.py).

These models have no mainline transformers class, so checkpoints are
fabricated in the HF *on-disk* naming (safetensors + config.json) and the
tests assert two independent things:

1. layout: fused/grouped projections land in the right GGUF slots with the
   same q/k permutation the llama path uses (which IS logit-parity-tested
   against transformers in test_convert_hf.py);
2. end-to-end: the converted GGUF loads through ModelConfig/load_params and
   the runtime forward matches the independent numpy oracle evaluated on
   the same GGUF (the test_new_archs comparison pattern).
"""

import json
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from prima_tpu.gguf.reader import GGUFModel
from prima_tpu.models.config import ModelConfig, RopeType
from prima_tpu.models.llama import ForwardOptions, forward, init_kv_caches, load_params
from prima_tpu.models.ref_numpy import forward_np
from prima_tpu.quant.dequant_np import dequantize_tensor
from prima_tpu.tools.convert_hf import convert_hf_to_gguf
from prima_tpu.tools.convert_extra import _permute_qk

from test_convert_hf import _write_tokenizer_json  # noqa: E402

F32_OPTS = ForwardOptions(dtype=jnp.float32, logits_dtype=jnp.float32,
                          matmul_impl="xla")


def _save_ckpt(d, cfg: dict, tensors: dict):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    _write_tokenizer_json(d, cfg["vocab_size"])
    from safetensors.numpy import save_file

    save_file({k: np.asarray(v, np.float32) for k, v in tensors.items()},
              os.path.join(d, "model.safetensors"))


def _rand(rng, *shape, scale=0.05):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def _llama_style_tensors(rng, nv, ne, nh, nkv, nff, nl, *, ln_bias=False,
                         w_pack=False, fused_grouped=False, names=None):
    """HF checkpoint dict in model.layers.* naming (or a custom scheme)."""
    hd = ne // nh
    t = {"model.embed_tokens.weight": _rand(rng, nv, ne),
         "model.norm.weight": 1.0 + _rand(rng, ne),
         "lm_head.weight": _rand(rng, nv, ne)}
    if ln_bias:
        t["model.norm.bias"] = _rand(rng, ne)
    for i in range(nl):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "post_attention_layernorm.weight"] = 1.0 + _rand(rng, ne)
        if ln_bias:
            t[p + "input_layernorm.bias"] = _rand(rng, ne)
            t[p + "post_attention_layernorm.bias"] = _rand(rng, ne)
        q = _rand(rng, nh * hd, ne)
        k = _rand(rng, nkv * hd, ne)
        v = _rand(rng, nkv * hd, ne)
        if w_pack:
            t[p + "self_attn.W_pack.weight"] = np.concatenate([q, k, v])
        else:
            t[p + "self_attn.q_proj.weight"] = q
            t[p + "self_attn.k_proj.weight"] = k
            t[p + "self_attn.v_proj.weight"] = v
        t[p + "self_attn.o_proj.weight"] = _rand(rng, ne, nh * hd)
        t[p + "mlp.gate_proj.weight"] = _rand(rng, nff, ne)
        t[p + "mlp.up_proj.weight"] = _rand(rng, nff, ne)
        t[p + "mlp.down_proj.weight"] = _rand(rng, ne, nff)
    return t


def _forward_vs_oracle(gguf_path, tokens=(3, 17, 42, 5)):
    """Runtime forward == numpy oracle on the SAME converted GGUF."""
    m = GGUFModel.open(gguf_path)
    cfg = ModelConfig.from_gguf(m)
    dense = {ti.name: dequantize_tensor(ti) for ti in m}
    params = load_params(m, cfg, dtype=jnp.float32)
    kv = init_kv_caches(cfg, 1, 64, jnp.float32)
    toks = np.asarray([list(tokens)], np.int32)
    pos = np.arange(len(tokens), dtype=np.int32)[None]
    got, _ = forward(params, cfg, toks, pos, kv, np.zeros(1, np.int32),
                     F32_OPTS)
    want = forward_np(dense, cfg, toks)
    np.testing.assert_allclose(np.asarray(got[0]), want[0],
                               rtol=2e-4, atol=2e-4)
    return cfg


def test_baichuan_w_pack_split(tmp_path):
    rng = np.random.default_rng(0)
    nv, ne, nh, nff, nl = 256, 64, 4, 96, 2
    cfg = {"architectures": ["BaichuanForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "intermediate_size": nff, "num_hidden_layers": nl,
           "max_sequence_length": 512, "rms_norm_eps": 1e-5}
    t = _llama_style_tensors(rng, nv, ne, nh, nh, nff, nl, w_pack=True)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0

    m = GGUFModel.open(dst)
    assert m.arch == "baichuan"
    pack = t["model.layers.0.self_attn.W_pack.weight"]
    r = pack.shape[0] // 3
    got_q = dequantize_tensor(m.tensors["blk.0.attn_q.weight"])
    got_k = dequantize_tensor(m.tensors["blk.0.attn_k.weight"])
    got_v = dequantize_tensor(m.tensors["blk.0.attn_v.weight"])
    np.testing.assert_array_equal(got_q, _permute_qk(pack[:r], nh))
    np.testing.assert_array_equal(got_k, _permute_qk(pack[r:2 * r], nh))
    np.testing.assert_array_equal(got_v, pack[2 * r:])
    m.close()
    mc = _forward_vs_oracle(dst)
    assert mc.rope_type == RopeType.NORM


def test_xverse_conversion(tmp_path):
    rng = np.random.default_rng(1)
    nv, ne, nh, nff, nl = 256, 64, 4, 96, 2
    cfg = {"architectures": ["XverseForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "intermediate_size": nff, "num_hidden_layers": nl,
           "max_position_embeddings": 512, "rms_norm_eps": 1e-5}
    t = _llama_style_tensors(rng, nv, ne, nh, nh, nff, nl)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "xverse"
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.1.attn_q.weight"]),
        _permute_qk(t["model.layers.1.self_attn.q_proj.weight"], nh))
    m.close()
    _forward_vs_oracle(dst)


def test_orion_conversion_no_permute(tmp_path):
    rng = np.random.default_rng(2)
    nv, ne, nh, nff, nl = 256, 64, 4, 96, 2
    cfg = {"architectures": ["OrionForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "intermediate_size": nff, "num_hidden_layers": nl,
           "max_position_embeddings": 512, "rms_norm_eps": 1e-5}
    t = _llama_style_tensors(rng, nv, ne, nh, nh, nff, nl, ln_bias=True)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "orion"
    # the reference's OrionModel does NOT permute q/k
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.attn_q.weight"]),
        t["model.layers.0.self_attn.q_proj.weight"])
    assert "blk.0.attn_norm.bias" in m.tensors
    assert m.get("orion.attention.layer_norm_epsilon") == pytest.approx(1e-5)
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.norm_type == "ln"


def test_internlm2_grouped_wqkv(tmp_path):
    rng = np.random.default_rng(3)
    nv, ne, nh, nkv, nff, nl = 256, 64, 4, 2, 96, 2
    hd = ne // nh
    q_per_kv = nh // nkv
    cfg = {"architectures": ["InternLM2ForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "num_key_value_heads": nkv, "intermediate_size": nff,
           "num_hidden_layers": nl, "max_position_embeddings": 512,
           "rms_norm_eps": 1e-5, "rope_theta": 10000.0}
    # fabricate known q/k/v, then pack them into the HF grouped layout:
    # (n_groups, q_per_kv + 2, head_dim, n_embd)
    t = {"model.tok_embeddings.weight": _rand(rng, nv, ne),
         "model.norm.weight": 1.0 + _rand(rng, ne),
         "output.weight": _rand(rng, nv, ne)}
    per_layer_qkv = []
    for i in range(nl):
        p = f"model.layers.{i}."
        q = _rand(rng, nh * hd, ne)
        k = _rand(rng, nkv * hd, ne)
        v = _rand(rng, nkv * hd, ne)
        per_layer_qkv.append((q, k, v))
        grouped = np.concatenate(
            [np.concatenate([q.reshape(nkv, q_per_kv, hd, ne)[g],
                             k.reshape(nkv, 1, hd, ne)[g],
                             v.reshape(nkv, 1, hd, ne)[g]])
             for g in range(nkv)])
        t[p + "attention.wqkv.weight"] = grouped.reshape(-1, ne)
        t[p + "attention.wo.weight"] = _rand(rng, ne, nh * hd)
        t[p + "attention_norm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "ffn_norm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "feed_forward.w1.weight"] = _rand(rng, nff, ne)
        t[p + "feed_forward.w3.weight"] = _rand(rng, nff, ne)
        t[p + "feed_forward.w2.weight"] = _rand(rng, ne, nff)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "internlm2"
    q0, k0, v0 = per_layer_qkv[0]
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.attn_q.weight"]),
        _permute_qk(q0, nh))
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.attn_k.weight"]),
        _permute_qk(k0, nkv))
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.attn_v.weight"]), v0)
    m.close()
    _forward_vs_oracle(dst)


def test_minicpm_conversion_scales(tmp_path):
    rng = np.random.default_rng(4)
    nv, ne, nh, nff, nl = 256, 64, 4, 96, 2
    cfg = {"architectures": ["MiniCPMForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "num_key_value_heads": nh, "intermediate_size": nff,
           "num_hidden_layers": nl, "max_position_embeddings": 512,
           "rms_norm_eps": 1e-5, "scale_emb": 12.0, "scale_depth": 1.4,
           "dim_model_base": 256}
    t = _llama_style_tensors(rng, nv, ne, nh, nh, nff, nl)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "minicpm"
    assert m.get("minicpm.embedding_scale") == pytest.approx(12.0)
    assert m.get("minicpm.residual_scale") == pytest.approx(1.4 / nl ** 0.5)
    assert m.get("minicpm.logit_scale") == pytest.approx(256.0 / ne)
    m.close()
    _forward_vs_oracle(dst)


def test_refact_conversion(tmp_path):
    from prima_tpu.tools.convert_extra import _refact_ff

    rng = np.random.default_rng(6)
    nv, ne, nh, nl = 256, 64, 4, 2
    hd = ne // nh
    ff = _refact_ff(ne)          # 256*ceil((2*(4*64)/3)/256) = 256
    cfg = {"architectures": ["GPTRefactForCausalLM"], "vocab_size": nv,
           "n_embd": ne, "n_head": nh, "n_layer": nl, "n_positions": 512,
           "layer_norm_epsilon": 1e-5}
    t = {"transformer.wte.weight": _rand(rng, nv, ne),
         "ln_f.weight": 1.0 + _rand(rng, ne),
         "lm_head.weight": _rand(rng, nv, ne)}
    for i in range(nl):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = 1.0 + _rand(rng, ne)
        t[p + "ln_2.weight"] = 1.0 + _rand(rng, ne)
        t[p + "attn.q.weight"] = _rand(rng, nh * hd, ne)
        t[p + "attn.kv.weight"] = _rand(rng, 2 * hd, ne)   # MQA: n_kv=1
        t[p + "attn.c_proj.weight"] = _rand(rng, ne, nh * hd)
        t[p + "mlp.gate_up_proj.weight"] = _rand(rng, 2 * ff, ne)
        t[p + "mlp.c_proj.weight"] = _rand(rng, ne, ff)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "refact"
    assert m.get("refact.attention.head_count_kv") == 1
    assert m.get("refact.feed_forward_length") == ff
    kv = t["transformer.h.0.attn.kv.weight"]
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.attn_k.weight"]), kv[:hd])
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.attn_v.weight"]), kv[hd:])
    gu = t["transformer.h.0.mlp.gate_up_proj.weight"]
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.ffn_gate.weight"]), gu[:ff])
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.ffn_up.weight"]), gu[ff:])
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.alibi_max_bias == 8.0 and cfgm.rope_dim == 0


def test_plamo_head_shuffle(tmp_path):
    rng = np.random.default_rng(7)
    nv, ne, nh, nkv, nff, nl = 256, 64, 4, 2, 96, 2
    hd, qpk = ne // nh, nh // nkv
    cfg = {"architectures": ["PlamoForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "num_key_value_heads": nkv, "intermediate_size": nff,
           "num_hidden_layers": nl, "rms_norm_eps": 1e-5}
    t = {"model.embed_tokens.weight": _rand(rng, nv, ne),
         "model.norm.weight": 1.0 + _rand(rng, ne),
         "lm_head.weight": _rand(rng, nv, ne)}
    # per-head q blocks so the de-interleave is checkable head-by-head
    q_heads = [[_rand(rng, hd, ne) for b in range(nkv)] for a in range(qpk)]
    o_cols = [[_rand(rng, ne, hd) for b in range(nkv)] for a in range(qpk)]
    for i in range(nl):
        p = f"model.layers.layers.{i}."
        t[p + "norm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "self_attn.q_proj.weight"] = np.concatenate(
            [q_heads[a][b] for a in range(qpk) for b in range(nkv)])
        t[p + "self_attn.k_proj.weight"] = _rand(rng, nkv * hd, ne)
        t[p + "self_attn.v_proj.weight"] = _rand(rng, nkv * hd, ne)
        t[p + "self_attn.o_proj.weight"] = np.concatenate(
            [o_cols[a][b] for a in range(qpk) for b in range(nkv)], axis=1)
        t[p + "mlp.gate_proj.weight"] = _rand(rng, nff, ne)
        t[p + "mlp.up_proj.weight"] = _rand(rng, nff, ne)
        t[p + "mlp.down_proj.weight"] = _rand(rng, ne, nff)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "plamo"
    # HF head a*nkv+b lands at GGUF head b*qpk+a (PlamoModel shuffle)
    got_q = dequantize_tensor(m.tensors["blk.0.attn_q.weight"])
    got_o = dequantize_tensor(m.tensors["blk.0.attn_output.weight"])
    np.testing.assert_array_equal(
        got_q, np.concatenate(
            [q_heads[a][b] for b in range(nkv) for a in range(qpk)]))
    np.testing.assert_array_equal(
        got_o, np.concatenate(
            [o_cols[a][b] for b in range(nkv) for a in range(qpk)], axis=1))
    assert "blk.0.ffn_norm.weight" not in m.tensors  # shared attn norm
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.parallel_block


def test_codeshell_conversion_tied_output(tmp_path):
    rng = np.random.default_rng(8)
    nv, ne, nh, nkv, nl = 256, 64, 4, 2, 2
    hd = ne // nh
    cfg = {"architectures": ["CodeShellForCausalLM"], "vocab_size": nv,
           "n_embd": ne, "n_head": nh, "num_query_groups": nkv,
           "n_layer": nl, "n_positions": 512, "n_inner": None,
           "layer_norm_epsilon": 1e-5}
    t = {"transformer.wte.weight": _rand(rng, nv, ne),
         "transformer.ln_f.weight": 1.0 + _rand(rng, ne),
         "transformer.ln_f.bias": _rand(rng, ne)}
    for i in range(nl):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = 1.0 + _rand(rng, ne)
        t[p + "ln_1.bias"] = _rand(rng, ne)
        t[p + "ln_2.weight"] = 1.0 + _rand(rng, ne)
        t[p + "ln_2.bias"] = _rand(rng, ne)
        t[p + "attn.c_attn.weight"] = _rand(rng, (nh + 2 * nkv) * hd, ne)
        t[p + "attn.c_attn.bias"] = _rand(rng, (nh + 2 * nkv) * hd)
        t[p + "attn.c_proj.weight"] = _rand(rng, ne, nh * hd)
        t[p + "attn.c_proj.bias"] = _rand(rng, ne)
        t[p + "mlp.c_fc.weight"] = _rand(rng, 4 * ne, ne)
        t[p + "mlp.c_fc.bias"] = _rand(rng, 4 * ne)
        t[p + "mlp.c_proj.weight"] = _rand(rng, ne, 4 * ne)
        t[p + "mlp.c_proj.bias"] = _rand(rng, ne)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "codeshell"
    assert m.get("codeshell.feed_forward_length") == 4 * ne
    assert m.get("codeshell.attention.head_count_kv") == nkv
    assert m.get("codeshell.attention.layer_norm_epsilon") == pytest.approx(1e-5)
    # no lm_head in the checkpoint -> output tied to wte (CodeShellModel)
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["output.weight"]),
        t["transformer.wte.weight"])
    assert "blk.0.attn_qkv.weight" in m.tensors
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.norm_type == "ln" and cfgm.act == "gelu"


def test_jais_conv1d_and_mup_scales(tmp_path):
    rng = np.random.default_rng(9)
    nv, ne, nh, nff, nl = 256, 64, 4, 96, 2
    cfg = {"architectures": ["JAISLMHeadModel"], "vocab_size": nv,
           "n_embd": ne, "n_head": nh, "n_layer": nl, "n_positions": 512,
           "n_inner": nff, "layer_norm_epsilon": 1e-5,
           "activation_function": "swiglu", "position_embedding_type": "alibi",
           "mup_embeddings_scale": 9.17, "mup_output_alpha": 1.22,
           "mup_width_scale": 0.35}
    wte = _rand(rng, nv, ne)
    t = {"transformer.wte.weight": wte,
         "transformer.ln_f.weight": 1.0 + _rand(rng, ne),
         "transformer.ln_f.bias": _rand(rng, ne),
         "transformer.relative_pe.slopes": np.asarray(
             [0.25, 0.0625, 0.015625, 0.00390625], np.float32)}
    for i in range(nl):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = 1.0 + _rand(rng, ne)
        t[p + "ln_1.bias"] = _rand(rng, ne)
        t[p + "ln_2.weight"] = 1.0 + _rand(rng, ne)
        t[p + "ln_2.bias"] = _rand(rng, ne)
        # Conv1D storage: (in_features, out_features)
        t[p + "attn.c_attn.weight"] = _rand(rng, ne, 3 * ne)
        t[p + "attn.c_attn.bias"] = _rand(rng, 3 * ne)
        t[p + "attn.c_proj.weight"] = _rand(rng, ne, ne)
        t[p + "attn.c_proj.bias"] = _rand(rng, ne)
        t[p + "mlp.c_fc.weight"] = _rand(rng, ne, nff)
        t[p + "mlp.c_fc.bias"] = _rand(rng, nff)
        t[p + "mlp.c_fc2.weight"] = _rand(rng, ne, nff)
        t[p + "mlp.c_fc2.bias"] = _rand(rng, nff)
        t[p + "mlp.c_proj.weight"] = _rand(rng, nff, ne)
        t[p + "mlp.c_proj.bias"] = _rand(rng, ne)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "jais"
    np.testing.assert_allclose(
        dequantize_tensor(m.tensors["token_embd.weight"]), wte * 9.17,
        rtol=1e-6)
    np.testing.assert_allclose(
        dequantize_tensor(m.tensors["output.weight"]), wte * (1.22 * 0.35),
        rtol=1e-6)
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.attn_qkv.weight"]),
        t["transformer.h.0.attn.c_attn.weight"].T)
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.1.ffn_gate.weight"]),
        t["transformer.h.1.mlp.c_fc2.weight"].T)
    assert "transformer.relative_pe.slopes" not in [ti.name for ti in m]
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.alibi_max_bias == 8.0 and cfgm.rope_dim == 0


def test_chatglm_conversion(tmp_path):
    rng = np.random.default_rng(10)
    nv, ne, nh, nkv, nff, nl = 256, 64, 4, 2, 96, 2
    hd = ne // nh
    cfg = {"architectures": ["ChatGLMModel"], "padded_vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "multi_query_group_num": nkv, "ffn_hidden_size": nff,
           "num_layers": nl, "seq_length": 512,
           "layernorm_epsilon": 1e-5, "rope_ratio": 50.0, "vocab_size": nv}
    t = {"transformer.embedding.word_embeddings.weight": _rand(rng, nv, ne),
         "transformer.encoder.final_layernorm.weight": 1.0 + _rand(rng, ne),
         "transformer.output_layer.weight": _rand(rng, nv, ne),
         "transformer.rotary_pos_emb.inv_freq": _rand(rng, hd // 4)}
    for i in range(nl):
        p = f"transformer.encoder.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "post_attention_layernorm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "self_attention.query_key_value.weight"] = _rand(
            rng, (nh + 2 * nkv) * hd, ne)
        t[p + "self_attention.query_key_value.bias"] = _rand(
            rng, (nh + 2 * nkv) * hd)
        t[p + "self_attention.dense.weight"] = _rand(rng, ne, nh * hd)
        t[p + "mlp.dense_h_to_4h.weight"] = _rand(rng, 2 * nff, ne)
        t[p + "mlp.dense_4h_to_h.weight"] = _rand(rng, ne, nff)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "chatglm"
    assert m.get("chatglm.attention.head_count_kv") == nkv
    assert m.get("chatglm.feed_forward_length") == nff
    assert m.get("chatglm.rope.freq_base") == pytest.approx(500000.0)
    assert m.get("chatglm.rope.dimension_count") == hd // 2
    assert "rotary_pos_emb.inv_freq" not in [ti.name for ti in m]
    assert "blk.0.attn_qkv.bias" in m.tensors
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.act == "swiglu_split"


def test_chameleon_qk_norms(tmp_path):
    rng = np.random.default_rng(11)
    nv, ne, nh, nkv, nff, nl = 256, 64, 4, 2, 96, 2
    hd = ne // nh
    cfg = {"architectures": ["ChameleonForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "num_key_value_heads": nkv, "intermediate_size": nff,
           "num_hidden_layers": nl, "max_position_embeddings": 512,
           "rms_norm_eps": 1e-5, "swin_norm": False}
    t = _llama_style_tensors(rng, nv, ne, nh, nkv, nff, nl)
    qn = _rand(rng, hd) + 1.0
    kn = _rand(rng, hd) + 1.0
    for i in range(nl):
        p = f"model.layers.{i}.self_attn."
        # HF stores per-head (n_heads, hd); reference uses head 0 only
        t[p + "q_norm.weight"] = np.tile(qn, (nh, 1))
        t[p + "q_norm.bias"] = np.zeros((nh, hd), np.float32)
        t[p + "k_norm.weight"] = np.tile(kn, (nkv, 1))
        t[p + "k_norm.bias"] = np.zeros((nkv, hd), np.float32)
    t["model.vqmodel.encoder.conv_in.weight"] = _rand(rng, 4, 4)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "chameleon"
    assert m.get("chameleon.swin_norm") is False
    # norm row 0, rotary halves re-interleaved (_reverse_hf_permute)
    want = qn.reshape(2, hd // 2).T.reshape(-1)
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.attn_q_norm.weight"]), want)
    assert not any(ti.name.startswith("model.vqmodel") for ti in m)
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.1.attn_q.weight"]),
        _permute_qk(t["model.layers.1.self_attn.q_proj.weight"], nh))
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.qk_norm_head


def test_exaone_conversion(tmp_path):
    rng = np.random.default_rng(5)
    nv, ne, nh, nkv, nff, nl = 256, 64, 4, 2, 96, 2
    hd = ne // nh
    cfg = {"architectures": ["ExaoneForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "num_key_value_heads": nkv, "intermediate_size": nff,
           "num_layers": nl, "max_position_embeddings": 512,
           "layer_norm_epsilon": 1e-5, "rope_theta": 10000.0,
           "activation_function": "silu"}
    t = {"transformer.wte.weight": _rand(rng, nv, ne),
         "transformer.ln_f.weight": 1.0 + _rand(rng, ne),
         "lm_head.weight": _rand(rng, nv, ne)}
    for i in range(nl):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = 1.0 + _rand(rng, ne)
        t[p + "ln_2.weight"] = 1.0 + _rand(rng, ne)
        t[p + "attn.attention.q_proj.weight"] = _rand(rng, nh * hd, ne)
        t[p + "attn.attention.k_proj.weight"] = _rand(rng, nkv * hd, ne)
        t[p + "attn.attention.v_proj.weight"] = _rand(rng, nkv * hd, ne)
        t[p + "attn.attention.out_proj.weight"] = _rand(rng, ne, nh * hd)
        t[p + "mlp.c_fc_0.weight"] = _rand(rng, nff, ne)
        t[p + "mlp.c_fc_1.weight"] = _rand(rng, nff, ne)
        t[p + "mlp.c_proj.weight"] = _rand(rng, ne, nff)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "exaone"
    # exaone is NEOX rope: q/k keep the HF layout
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.attn_q.weight"]),
        t["transformer.h.0.attn.attention.q_proj.weight"])
    assert "blk.0.ffn_gate.weight" in m.tensors
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.rope_type == RopeType.NEOX
