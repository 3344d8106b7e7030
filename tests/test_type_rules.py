"""llama_tensor_get_type port (quant/type_rules.py) vs the reference's
rules (src/llama.cpp:19271-19556), asserted tensor-by-tensor on a
Llama-3-8B-shaped tensor stream and on the special cases (GQA bumps,
size-mix _S/_M/_L variants, tied embeddings, row-size fallbacks)."""

import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.quant.type_rules import (FTYPE_DEFAULT, QuantPlanner,
                                        use_more_bits)


def llama8b_stream():
    """The 2-D weight tensors of Llama-3-8B in file order, (name, shape)
    with shape = (rows, ne0)."""
    out = [("token_embd.weight", (128256, 4096))]
    for i in range(32):
        out += [
            (f"blk.{i}.attn_q.weight", (4096, 4096)),
            (f"blk.{i}.attn_k.weight", (1024, 4096)),
            (f"blk.{i}.attn_v.weight", (1024, 4096)),
            (f"blk.{i}.attn_output.weight", (4096, 4096)),
            (f"blk.{i}.ffn_gate.weight", (14336, 4096)),
            (f"blk.{i}.ffn_up.weight", (14336, 4096)),
            (f"blk.{i}.ffn_down.weight", (4096, 14336)),
        ]
    out.append(("output.weight", (128256, 4096)))
    return out


def plan(ftype, stream=None, **kw):
    defaults = dict(n_layer=32, n_gqa=4, n_expert=0, arch="llama",
                    n_attention_wv=32, n_ffn_down=32)
    defaults.update(kw)
    p = QuantPlanner(ftype=ftype, **defaults)
    return {name: p.get_type(name, shape)
            for name, shape in (stream or llama8b_stream())}


def test_use_more_bits_pattern():
    # @19278: i < n/8, i >= 7n/8, or (i - n/8) % 3 == 2
    got = [i for i in range(32) if use_more_bits(i, 32)]
    assert got == [0, 1, 2, 3, 6, 9, 12, 15, 18, 21, 24, 27,
                   28, 29, 30, 31]


def test_q4_k_m_plan_matches_reference():
    got = plan("Q4_K_M")
    assert got["output.weight"] == GGMLType.Q6_K
    assert got["token_embd.weight"] == GGMLType.Q4_K
    for i in range(32):
        bump = use_more_bits(i, 32)
        assert got[f"blk.{i}.attn_v.weight"] == (
            GGMLType.Q6_K if bump else GGMLType.Q4_K), i
        assert got[f"blk.{i}.ffn_down.weight"] == (
            GGMLType.Q6_K if bump else GGMLType.Q4_K), i
        for t in ("attn_q", "attn_k", "attn_output", "ffn_gate", "ffn_up"):
            assert got[f"blk.{i}.{t}.weight"] == GGMLType.Q4_K, (i, t)


def test_q4_k_s_plan():
    got = plan("Q4_K_S")
    # attn_v: first 4 layers Q5_K (@19383); ffn_down: first n/8 Q5_K (@19450)
    for i in range(32):
        assert got[f"blk.{i}.attn_v.weight"] == (
            GGMLType.Q5_K if i < 4 else GGMLType.Q4_K), i
        assert got[f"blk.{i}.ffn_down.weight"] == (
            GGMLType.Q5_K if i < 4 else GGMLType.Q4_K), i
    assert got["output.weight"] == GGMLType.Q6_K


def test_q3_k_variants():
    m = plan("Q3_K_M")
    # attn_v: first two Q5_K then Q4_K (@19376); attn_output Q4_K (@19471)
    assert m["blk.0.attn_v.weight"] == GGMLType.Q5_K
    assert m["blk.1.attn_v.weight"] == GGMLType.Q5_K
    assert m["blk.2.attn_v.weight"] == GGMLType.Q4_K
    assert m["blk.5.attn_output.weight"] == GGMLType.Q4_K
    # ffn_down: < n/16 -> Q5_K else Q4_K for non-falcon (@19426)
    assert m["blk.1.ffn_down.weight"] == GGMLType.Q5_K
    assert m["blk.2.ffn_down.weight"] == GGMLType.Q4_K
    assert m["blk.9.ffn_down.weight"] == GGMLType.Q4_K

    li = plan("Q3_K_L")
    assert li["blk.7.attn_v.weight"] == GGMLType.Q5_K
    assert li["blk.7.ffn_down.weight"] == GGMLType.Q5_K
    assert li["blk.7.attn_output.weight"] == GGMLType.Q5_K
    assert li["blk.7.attn_q.weight"] == GGMLType.Q3_K

    s = plan("Q3_K_S")
    assert s["blk.7.attn_v.weight"] == GGMLType.Q3_K
    assert s["blk.7.ffn_down.weight"] == GGMLType.Q3_K


def test_q2_k_gqa_and_s_variant():
    got = plan("Q2_K")  # n_gqa=4 -> attn_v Q4_K (@19363)
    assert got["blk.0.attn_v.weight"] == GGMLType.Q4_K
    assert got["blk.0.ffn_down.weight"] == GGMLType.Q3_K
    assert got["blk.0.attn_output.weight"] == GGMLType.Q3_K

    nogqa = plan("Q2_K", n_gqa=1)
    assert nogqa["blk.0.attn_v.weight"] == GGMLType.Q3_K

    s = plan("Q2_K_S")
    assert s["blk.0.attn_v.weight"] == GGMLType.Q4_K  # n_gqa>=4 (@19366)
    assert s["blk.3.ffn_down.weight"] == GGMLType.Q4_K  # i < n/8
    assert s["blk.4.ffn_down.weight"] == GGMLType.Q2_K


def test_q5_k_m_bumps():
    got = plan("Q5_K_M")
    assert got["blk.0.attn_v.weight"] == GGMLType.Q6_K
    assert got["blk.4.attn_v.weight"] == GGMLType.Q5_K
    assert got["blk.0.ffn_down.weight"] == GGMLType.Q6_K
    assert got["blk.4.ffn_down.weight"] == GGMLType.Q5_K


def test_tied_embeddings_output_rule():
    stream = [t for t in llama8b_stream() if t[0] != "output.weight"]
    got = plan("Q4_K_M", stream=stream, has_output=False)
    # token_embd plays the output role -> Q6_K (@19301)
    assert got["token_embd.weight"] == GGMLType.Q6_K


def test_row_size_fallbacks():
    p = QuantPlanner(ftype="Q4_K_M", n_layer=2, n_gqa=1)
    # 4000 % 256 != 0: Q4_K falls back to Q5_0 (@19544)
    assert p.get_type("blk.0.ffn_gate.weight", (64, 4000)) == GGMLType.Q5_0
    # output.weight with bad row size takes Q8_0 BEFORE the fallback (@19306)
    assert p.get_type("output.weight", (100, 4000)) == GGMLType.Q8_0
    # Q6_K-bound tensor with bad rows -> Q8_0 (@19546)
    p2 = QuantPlanner(ftype="Q4_K_M", n_layer=8, n_gqa=1)
    assert p2.get_type("blk.0.attn_v.weight", (64, 4000)) == GGMLType.Q8_0


def test_attn_qkv_rule():
    p = QuantPlanner(ftype="Q4_K_M", n_layer=2, n_gqa=1)
    assert p.get_type("blk.0.attn_qkv.weight", (768, 4096)) == GGMLType.Q5_K
    p = QuantPlanner(ftype="Q5_K_M", n_layer=2, n_gqa=1)
    assert p.get_type("blk.0.attn_qkv.weight", (768, 4096)) == GGMLType.Q6_K


def test_moe_8_expert_rules():
    p = QuantPlanner(ftype="Q4_K_M", n_layer=32, n_gqa=4, n_expert=8)
    assert p.get_type("blk.0.attn_v.weight", (1024, 4096)) == GGMLType.Q8_0
    assert p.get_type("blk.0.attn_k.weight", (1024, 4096)) == GGMLType.Q8_0
    assert p.get_type("blk.0.attn_output.weight",
                      (4096, 4096)) == GGMLType.Q5_K


def test_iq_low_bit_rules():
    p = QuantPlanner(ftype="IQ2_XS", n_layer=32, n_gqa=4,
                     n_attention_wv=32, n_ffn_down=32)
    assert p.get_type("blk.0.attn_v.weight", (1024, 4096)) == GGMLType.Q4_K
    # first n/8 ffn_down -> Q2_K (@19344)
    assert p.get_type("blk.0.ffn_down.weight", (4096, 14336)) == GGMLType.Q2_K
    for _ in range(3):  # advance the i_ffn_down counter past n/8
        p.get_type("blk.x.ffn_down.weight", (4096, 14336))
    assert p.get_type("blk.9.ffn_down.weight",
                      (4096, 14336)) == GGMLType.IQ2_XS
    assert p.get_type("token_embd.weight", (128256, 4096)) == GGMLType.Q2_K
    assert p.get_type("output.weight", (128256, 4096)) == GGMLType.Q5_K


def test_quantize_gguf_applies_plan(tmp_path):
    """End-to-end: a Q4_K_M requant of a tiny GGUF must place per-tensor
    types according to the planner (incompatible rows fall back)."""
    from prima_tpu.gguf.reader import GGUFModel
    from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf
    from prima_tpu.tools.quantize import quantize_gguf
    import os

    srcp = str(tmp_path / "tiny.gguf")
    make_tiny_gguf(srcp, seed=1)
    dst = str(tmp_path / "q.gguf")
    quantize_gguf(srcp, dst, "Q4_K_M", logfile=open(os.devnull, "w"))
    m = GGUFModel.open(dst)
    src = GGUFModel.open(srcp)
    md = src.metadata
    arch = md.get("general.architecture", "llama")
    n_layer = int(md[f"{arch}.block_count"])
    for i in range(n_layer):
        want = GGMLType.Q6_K if use_more_bits(i, n_layer) else GGMLType.Q4_K
        ti = m.tensors[f"blk.{i}.attn_v.weight"]
        if ti.ne[0] % 256 == 0:
            assert ti.ggml_type == want, i
    assert m.tensors["output.weight"].ggml_type in (GGMLType.Q6_K,
                                                    GGMLType.Q8_0)
    m.close()
    src.close()
