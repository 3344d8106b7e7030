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

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

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


# ---------------------------------------------------------------------------
# batch 3: minicpm3 / openelm / bitnet / grok / arctic / rwkv6


def test_minicpm3_conversion(tmp_path):
    rng = np.random.default_rng(12)
    nv, ne, nh, nl, nff = 256, 64, 4, 2, 96
    qlora, kvlora, qk_nope, qk_rope, vdim = 32, 16, 8, 8, 8
    cfg = {"architectures": ["MiniCPM3ForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "num_key_value_heads": nh, "intermediate_size": nff,
           "num_hidden_layers": nl, "max_position_embeddings": 512,
           "rms_norm_eps": 1e-6, "q_lora_rank": qlora,
           "kv_lora_rank": kvlora, "qk_nope_head_dim": qk_nope,
           "qk_rope_head_dim": qk_rope, "v_head_dim": vdim,
           "scale_emb": 12.0, "scale_depth": 1.4, "dim_model_base": 256,
           "rope_scaling": {"type": "longrope",
                            "long_factor": [1.0, 1.5, 2.0, 4.0],
                            "short_factor": [1.0, 1.0, 1.0, 1.0]}}
    t = {"model.embed_tokens.weight": _rand(rng, nv, ne),
         "model.norm.weight": 1.0 + _rand(rng, ne),
         "lm_head.weight": _rand(rng, nv, ne)}
    for i in range(nl):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "post_attention_layernorm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "self_attn.q_a_proj.weight"] = _rand(rng, qlora, ne)
        t[p + "self_attn.q_a_layernorm.weight"] = 1.0 + _rand(rng, qlora)
        t[p + "self_attn.q_b_proj.weight"] = _rand(
            rng, nh * (qk_nope + qk_rope), qlora)
        t[p + "self_attn.kv_a_proj_with_mqa.weight"] = _rand(
            rng, kvlora + qk_rope, ne)
        t[p + "self_attn.kv_a_layernorm.weight"] = 1.0 + _rand(rng, kvlora)
        t[p + "self_attn.kv_b_proj.weight"] = _rand(
            rng, nh * (qk_nope + vdim), kvlora)
        t[p + "self_attn.o_proj.weight"] = _rand(rng, ne, nh * vdim)
        t[p + "mlp.gate_proj.weight"] = _rand(rng, nff, ne)
        t[p + "mlp.up_proj.weight"] = _rand(rng, nff, ne)
        t[p + "mlp.down_proj.weight"] = _rand(rng, ne, nff)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "minicpm3"
    assert m.get("minicpm3.attention.q_lora_rank") == qlora
    assert m.get("minicpm3.attention.kv_lora_rank") == kvlora
    assert m.get("minicpm3.attention.key_length") == qk_nope + qk_rope
    assert m.get("minicpm3.attention.value_length") == vdim
    assert m.get("minicpm3.rope.dimension_count") == qk_rope
    assert m.get("minicpm3.embedding_scale") == pytest.approx(12.0)
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["rope_factors_long.weight"]),
        np.asarray([1.0, 1.5, 2.0, 4.0], np.float32))
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.1.attn_kv_b.weight"]),
        t["model.layers.1.self_attn.kv_b_proj.weight"])
    # runs end-to-end through the MLA runtime (parity itself is covered
    # by test_minicpm3.py on a directly-written GGUF)
    from prima_tpu.models.deepseek2 import (DeepseekV2Config,
                                            deepseek2_forward,
                                            load_deepseek2_params)

    dcfg = DeepseekV2Config.from_gguf(m)
    params = load_deepseek2_params(m, dcfg)
    logits = deepseek2_forward(params, dcfg,
                               np.asarray([[3, 5, 7]], np.int32))
    assert np.isfinite(np.asarray(logits)).all()
    m.close()


def test_openelm_conversion(tmp_path):
    from prima_tpu.tools.convert_extra import _openelm_ffn_dims

    rng = np.random.default_rng(13)
    nv, ne, hd, nl = 256, 64, 16, 3
    heads, kv_heads = [2, 3, 4], [1, 1, 2]
    cfg = {"architectures": ["OpenELMForCausalLM"], "vocab_size": nv,
           "model_dim": ne, "head_dim": hd,
           "num_transformer_layers": nl, "num_query_heads": heads,
           "num_kv_heads": kv_heads, "max_context_length": 512,
           "rope_freq_constant": 10000.0,
           "ffn_multipliers": [0.75, 1.0, 1.5], "ffn_dim_divisor": 16}
    ffs = _openelm_ffn_dims(cfg)
    assert ffs == [48, 64, 96]
    t = {"transformer.token_embeddings.weight": _rand(rng, nv, ne),
         "transformer.norm.weight": 1.0 + _rand(rng, ne)}
    for i in range(nl):
        p = f"transformer.layers.{i}."
        h, kvh, ff = heads[i], kv_heads[i], ffs[i]
        t[p + "attn_norm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "attn.qkv_proj.weight"] = _rand(rng, (h + 2 * kvh) * hd, ne)
        t[p + "attn.q_norm.weight"] = 1.0 + _rand(rng, hd)
        t[p + "attn.k_norm.weight"] = 1.0 + _rand(rng, hd)
        t[p + "attn.out_proj.weight"] = _rand(rng, ne, h * hd)
        t[p + "ffn_norm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "ffn.proj_1.weight"] = _rand(rng, 2 * ff, ne)
        t[p + "ffn.proj_2.weight"] = _rand(rng, ne, ff)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "openelm"
    assert list(m.get("openelm.attention.head_count")) == heads
    assert list(m.get("openelm.attention.head_count_kv")) == kv_heads
    assert list(m.get("openelm.feed_forward_length")) == ffs
    # fused gate|up split at the per-layer FFN width
    p1 = t["transformer.layers.2.ffn.proj_1.weight"]
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.2.ffn_gate.weight"]), p1[:96])
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.2.ffn_up.weight"]), p1[96:])
    assert "output.weight" not in m.tensors  # tied lm_head
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.qk_norm_rms and cfgm.n_heads_arr == tuple(heads)


def test_bitnet_conversion_ternary(tmp_path):
    from prima_tpu.tools.convert_extra import _bitnet_weight_quant

    rng = np.random.default_rng(14)
    nv, ne, nh, nkv, nff, nl = 256, 64, 4, 2, 96, 2
    cfg = {"architectures": ["BitnetForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "num_key_value_heads": nkv, "intermediate_size": nff,
           "num_hidden_layers": nl, "max_position_embeddings": 512,
           "rms_norm_eps": 1e-5}
    t = _llama_style_tensors(rng, nv, ne, nh, nkv, nff, nl)
    del t["lm_head.weight"]  # tied
    for i in range(nl):
        p = f"model.layers.{i}."
        t[p + "self_attn.inner_attn_ln.weight"] = 1.0 + _rand(rng, ne)
        t[p + "mlp.ffn_layernorm.weight"] = 1.0 + _rand(rng, nff)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "bitnet"
    assert m.get("bitnet.rope.scaling.type") == "linear"
    got = dequantize_tensor(m.tensors["blk.0.attn_q.weight"])
    want = _bitnet_weight_quant(t["model.layers.0.self_attn.q_proj.weight"])
    np.testing.assert_array_equal(got, want)
    assert len(np.unique(np.round(got / np.abs(got[got != 0]).min(), 6))) <= 3
    assert "blk.0.attn_sub_norm.weight" in m.tensors
    assert "blk.1.ffn_sub_norm.weight" in m.tensors
    # sub-norms must NOT be ternarized
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.attn_sub_norm.weight"]),
        t["model.layers.0.self_attn.inner_attn_ln.weight"])
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.sub_norms and cfgm.rope_type == RopeType.NEOX


def test_grok_conversion_moe_merge(tmp_path):
    rng = np.random.default_rng(15)
    nv, ne, nh, nkv, nff, nl, nexp = 256, 64, 4, 2, 48, 2, 4
    hd = ne // nh
    cfg = {"architectures": ["GrokForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "num_key_value_heads": nkv, "intermediate_size": nff,
           "num_hidden_layers": nl, "max_position_embeddings": 512,
           "rms_norm_eps": 1e-5, "num_local_experts": nexp,
           "num_experts_per_tok": 2}
    t = {"transformer.in_out_embed.weight": _rand(rng, nv, ne),
         "transformer.rms_norm.weight": 1.0 + _rand(rng, ne),
         "lm_head.weight": _rand(rng, nv, ne)}
    for i in range(nl):
        p = f"transformer.decoder_layer.{i}."
        for nm in ("rms_norm", "rms_norm_1", "rms_norm_2", "rms_norm_3"):
            t[p + nm + ".weight"] = 1.0 + _rand(rng, ne)
        t[p + "multi_head_attention.query.weight"] = _rand(rng, nh * hd, ne)
        t[p + "multi_head_attention.key.weight"] = _rand(rng, nkv * hd, ne)
        t[p + "multi_head_attention.value.weight"] = _rand(rng, nkv * hd, ne)
        t[p + "multi_head_attention.linear.weight"] = _rand(rng, ne, nh * hd)
        t[p + "router.weight"] = _rand(rng, nexp, ne)
        for x in range(nexp):
            t[p + f"moe.{x}.linear.weight"] = _rand(rng, nff, ne)
            t[p + f"moe.{x}.linear_1.weight"] = _rand(rng, ne, nff)
            t[p + f"moe.{x}.linear_v.weight"] = _rand(rng, nff, ne)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "grok"
    assert m.get("grok.expert_count") == nexp
    gate = dequantize_tensor(m.tensors["blk.0.ffn_gate_exps.weight"])
    assert gate.shape == (nexp, nff, ne)
    np.testing.assert_array_equal(
        gate[2], t["transformer.decoder_layer.0.moe.2.linear.weight"])
    down = dequantize_tensor(m.tensors["blk.1.ffn_down_exps.weight"])
    np.testing.assert_array_equal(
        down[3], t["transformer.decoder_layer.1.moe.3.linear_1.weight"])
    assert "blk.0.attn_out_norm.weight" in m.tensors
    assert "blk.0.layer_out_norm.weight" in m.tensors
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.post_norms and cfgm.attn_logit_softcap == 30.0


def test_arctic_conversion(tmp_path):
    rng = np.random.default_rng(16)
    nv, ne, nh, nff, nl, nexp = 256, 64, 4, 48, 2, 4
    hd = ne // nh
    cfg = {"architectures": ["ArcticForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_attention_heads": nh,
           "num_key_value_heads": nh, "intermediate_size": nff,
           "num_hidden_layers": nl, "max_position_embeddings": 512,
           "rms_norm_eps": 1e-5, "num_local_experts": nexp,
           "num_experts_per_tok": 2}
    t = {"model.embed_tokens.weight": _rand(rng, nv, ne),
         "model.norm.weight": 1.0 + _rand(rng, ne),
         "lm_head.weight": _rand(rng, nv, ne)}
    for i in range(nl):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "residual_layernorm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "post_attention_layernorm.weight"] = 1.0 + _rand(rng, ne)
        t[p + "self_attn.q_proj.weight"] = _rand(rng, nh * hd, ne)
        t[p + "self_attn.k_proj.weight"] = _rand(rng, nh * hd, ne)
        t[p + "self_attn.v_proj.weight"] = _rand(rng, nh * hd, ne)
        t[p + "self_attn.o_proj.weight"] = _rand(rng, ne, nh * hd)
        t[p + "residual_mlp.w1.weight"] = _rand(rng, nff, ne)
        t[p + "residual_mlp.w3.weight"] = _rand(rng, nff, ne)
        t[p + "residual_mlp.w2.weight"] = _rand(rng, ne, nff)
        t[p + "block_sparse_moe.gate.weight"] = _rand(rng, nexp, ne)
        for x in range(nexp):
            b = p + f"block_sparse_moe.experts.{x}."
            t[b + "w1.weight"] = _rand(rng, nff, ne)
            t[b + "w2.weight"] = _rand(rng, ne, nff)
            t[b + "w3.weight"] = _rand(rng, nff, ne)
    d = str(tmp_path / "hf")
    _save_ckpt(d, cfg, t)
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "arctic"
    # the two norms land in arctic's swapped slots
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.ffn_norm.weight"]),
        t["model.layers.0.residual_layernorm.weight"])
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.ffn_norm_exps.weight"]),
        t["model.layers.0.post_attention_layernorm.weight"])
    # q/k are rope-permuted like llama; experts stack in hf order
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.attn_q.weight"]),
        _permute_qk(t["model.layers.0.self_attn.q_proj.weight"], nh))
    up = dequantize_tensor(m.tensors["blk.1.ffn_up_exps.weight"])
    np.testing.assert_array_equal(
        up[1], t["model.layers.1.block_sparse_moe.experts.1.w3.weight"])
    m.close()
    cfgm = _forward_vs_oracle(dst)
    assert cfgm.moe_parallel_dense


def test_rwkv6_conversion(tmp_path):
    rng = np.random.default_rng(17)
    nv, ne, hs, nl, nff = 68, 32, 8, 2, 64
    H = ne // hs
    tmx, tdx = 32, 64
    cfg = {"architectures": ["Rwkv6ForCausalLM"], "vocab_size": nv,
           "hidden_size": ne, "num_hidden_layers": nl, "head_size": hs,
           "intermediate_size": nff, "layer_norm_epsilon": 1e-5,
           "rescale_every": 2}
    t = {"rwkv.embeddings.weight": _rand(rng, nv, ne),
         "rwkv.blocks.0.pre_ln.weight": 1.0 + _rand(rng, ne),
         "rwkv.blocks.0.pre_ln.bias": _rand(rng, ne),
         "rwkv.ln_out.weight": 1.0 + _rand(rng, ne),
         "rwkv.ln_out.bias": _rand(rng, ne),
         "head.weight": _rand(rng, nv, ne)}
    for i in range(nl):
        p = f"rwkv.blocks.{i}."
        for ln in ("ln1", "ln2"):
            t[p + ln + ".weight"] = 1.0 + _rand(rng, ne)
            t[p + ln + ".bias"] = _rand(rng, ne)
        a = p + "attention."
        for nm in ("time_maa_x", "time_maa_w", "time_maa_k",
                   "time_maa_v", "time_maa_r", "time_maa_g"):
            t[a + nm] = _rand(rng, 1, 1, ne)
        t[a + "time_maa_w1"] = _rand(rng, ne, 5 * tmx)
        t[a + "time_maa_w2"] = _rand(rng, 5, tmx, ne)
        t[a + "time_faaaa"] = _rand(rng, H, hs)
        t[a + "time_decay"] = _rand(rng, 1, 1, ne)
        t[a + "time_decay_w1"] = _rand(rng, ne, tdx)
        t[a + "time_decay_w2"] = _rand(rng, tdx, ne)
        for nm in ("key", "value", "receptance", "gate"):
            t[a + nm + ".weight"] = _rand(rng, ne, ne)
        t[a + "output.weight"] = _rand(rng, ne, ne)
        t[a + "ln_x.weight"] = 1.0 + _rand(rng, ne)
        t[a + "ln_x.bias"] = _rand(rng, ne)
        f = p + "feed_forward."
        t[f + "time_maa_k"] = _rand(rng, 1, 1, ne)
        t[f + "time_maa_r"] = _rand(rng, 1, 1, ne)
        t[f + "key.weight"] = _rand(rng, nff, ne)
        t[f + "receptance.weight"] = _rand(rng, ne, ne)
        t[f + "value.weight"] = _rand(rng, ne, nff)
    d = str(tmp_path / "hf")
    os.makedirs(d, exist_ok=True)
    # rwkv world vocab file: "<id> <repr> <len>" lines (no tokenizer.json)
    with open(os.path.join(d, "rwkv_vocab_v20230424.txt"), "w") as f:
        for i in range(nv - 4):
            tok = bytes([32 + i]) if i < 20 else f"w{i}"
            blen = len(tok) if isinstance(tok, bytes) \
                else len(tok.encode("utf-8"))
            f.write(f"{i + 1} {tok!r} {blen}\n")
    with open(os.path.join(d, "config.json"), "w") as fj:
        json.dump(cfg, fj)
    from safetensors.numpy import save_file

    save_file({k: np.asarray(v, np.float32) for k, v in t.items()},
              os.path.join(d, "model.safetensors"))
    dst = str(tmp_path / "m.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "rwkv6"
    assert m.get("rwkv6.wkv.head_size") == hs
    assert m.get("rwkv6.rescale_every_n_layers") == 2
    assert m.get("tokenizer.ggml.model") == "rwkv"
    toks = m.get("tokenizer.ggml.tokens")
    assert len(toks) == nv and toks[0] == "<s>"
    # transposes (Rwkv6Model modify_tensors)
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.time_mix_w1.weight"]),
        t["rwkv.blocks.0.attention.time_maa_w1"].T)
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.time_mix_w2.weight"]),
        t["rwkv.blocks.0.attention.time_maa_w2"].transpose(0, 2, 1))
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.1.time_mix_decay_w2.weight"]),
        t["rwkv.blocks.1.attention.time_decay_w2"].T)
    # rescale_every=2: layer 0 /1, layer 1 /1... bid//2: l0->0, l1->0
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.1.time_mix_output.weight"]),
        t["rwkv.blocks.1.attention.output.weight"] / (2 ** (1 // 2)))
    # loads + runs through the recurrent runtime
    from prima_tpu.models.rwkv6 import (Rwkv6Config, init_rwkv6_state,
                                        load_rwkv6_params, rwkv6_forward)

    rcfg = Rwkv6Config.from_gguf(m)
    assert rcfg.n_heads == H
    params = load_rwkv6_params(m, rcfg)
    state = init_rwkv6_state(rcfg, 1)
    logits, _ = rwkv6_forward(params, rcfg,
                              np.asarray([[1, 2, 3]], np.int32), state)
    assert np.isfinite(np.asarray(logits)).all()
    m.close()
