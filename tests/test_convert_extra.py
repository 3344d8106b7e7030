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
