"""Second-wave HF -> GGUF converters: the remote-code / niche architectures.

The analogue of the remaining converter classes in the reference's
convert_hf_to_gguf.py (BaichuanModel @1104, XverseModel @1184, OrionModel
@1069, InternLM2Model @2346, MiniCPMModel @1826, ExaoneModel @4044, ...).
Unlike the mainline families in convert_hf.py, most of these models ship
with remote modeling code, so conversion is driven purely by checkpoint
tensor names (safetensors) + config.json — no transformers class needed.

Design: a small spec per architecture (rename map + optional tensor
transform + arch KVs) executed by one generic driver, instead of the
reference's per-class inheritance.  Specs are registered by HF
`architectures` entry and dispatched from convert_hf.convert_hf_to_gguf.
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass, field
from typing import Callable, Iterable

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter
from .quantize import FTYPES, _encode, _target_type

Emit = Iterable[tuple]  # (gguf_name, np.ndarray) or (gguf_name, arr, ne)


@dataclass
class ArchSpec:
    arch: str
    # rename-only map entries: exact top-level names + per-layer suffixes
    top: list = field(default_factory=list)          # (hf_name, gguf_name)
    layer: list = field(default_factory=list)        # (suffix, gguf_suffix)
    layer_prefix: str = "model.layers."
    eps_key: str = "rms"                             # "rms" | "ln" | "both"
    # mutate the derived-dims dict before the generic KV block: derive(hf, d)
    derive: Callable | None = None
    # arch-specific KVs, called after the generic block: kv(w, hf, d)
    kv: Callable | None = None
    # full-control tensor hook: yields emits, or None -> fall back to maps
    transform: Callable | None = None
    # post-iteration hook for buffered tensors (MoE stacking etc.)
    finish: Callable | None = None


def _permute_qk(w: np.ndarray, n_heads: int) -> np.ndarray:
    """HF interleaved rotary order -> GGUF adjacent-pair ('norm') order."""
    rows, k = w.shape
    hd = rows // n_heads
    return (w.reshape(n_heads, 2, hd // 2, k)
            .transpose(0, 2, 1, 3)
            .reshape(rows, k))


def _rename(spec: ArchSpec, hf_name: str) -> str | None:
    for src, dst in spec.top:
        if hf_name == src:
            return dst
    if hf_name.startswith(spec.layer_prefix):
        rest = hf_name[len(spec.layer_prefix):]
        idx, _, rest = rest.partition(".")
        for src, dst in spec.layer:
            if rest == src:
                return f"blk.{idx}.{dst}"
    return None


def _derived(hf: dict) -> dict:
    n_embd = int(hf.get("hidden_size") or hf.get("n_embd") or hf.get("d_model") or 0)
    n_heads = int(hf.get("num_attention_heads") or hf.get("n_head")
                  or hf.get("n_heads") or 0)
    n_kv = int(hf.get("num_key_value_heads") or hf.get("num_kv_heads")
               or hf.get("multi_query_group_num") or hf.get("num_query_groups")
               or n_heads or 0)
    n_layers = int(hf.get("num_hidden_layers") or hf.get("n_layer")
                   or hf.get("n_layers") or hf.get("num_layers") or 0)
    return {
        "n_embd": n_embd, "n_heads": n_heads, "n_kv": n_kv,
        "n_layers": n_layers,
        "head_dim": (n_embd // n_heads) if n_heads else 0,
        "n_ff": int(hf.get("intermediate_size") or hf.get("n_inner")
                    or hf.get("ffn_hidden_size") or (4 * n_embd)),
        "n_ctx": int(hf.get("max_sequence_length")
                     or hf.get("max_position_embeddings")
                     or hf.get("model_max_length")
                     or hf.get("seq_length") or hf.get("n_positions") or 4096),
    }


def convert_extra(src_dir: str, dst_path: str, hf: dict, ftype: str,
                  logfile=sys.stderr) -> int | None:
    """Convert via the spec registry; None if no spec covers `hf`."""
    spec = None
    for a in hf.get("architectures") or []:
        if a in _SPECS:
            spec = _SPECS[a]
            break
    if spec is None:
        return None
    # local imports to avoid a cycle (convert_hf imports this module)
    from .convert_hf import _iter_hf_tensors, _write_tokenizer

    d = _derived(hf)
    if spec.derive is not None:
        spec.derive(hf, d)
    arch = spec.arch
    w = GGUFWriter(dst_path, arch=arch)
    w.add_kv("general.name", os.path.basename(os.path.normpath(src_dir)))
    w.add_kv(f"{arch}.block_count", d["n_layers"])
    w.add_kv(f"{arch}.embedding_length", d["n_embd"])
    w.add_kv(f"{arch}.feed_forward_length", d["n_ff"])
    w.add_kv(f"{arch}.attention.head_count", d["n_heads"])
    w.add_kv(f"{arch}.attention.head_count_kv", d["n_kv"])
    w.add_kv(f"{arch}.context_length", d["n_ctx"])
    eps = float(hf.get("rms_norm_eps") or hf.get("layer_norm_epsilon")
                or hf.get("layer_norm_eps") or hf.get("layernorm_epsilon")
                or hf.get("norm_eps") or 1e-5)
    if spec.eps_key in ("rms", "both"):
        w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", eps)
    if spec.eps_key in ("ln", "both"):
        w.add_kv(f"{arch}.attention.layer_norm_epsilon", eps)
    w.add_kv(f"{arch}.rope.freq_base", float(hf.get("rope_theta", 10000.0)))
    rot_pct = hf.get("partial_rotary_factor") or hf.get("rope_pct") or 1.0
    w.add_kv(f"{arch}.rope.dimension_count",
             int(d["head_dim"] * float(rot_pct)))
    if hf.get("vocab_size"):
        w.add_kv(f"{arch}.vocab_size", int(hf["vocab_size"]))
    rs = hf.get("rope_scaling") or {}
    if rs.get("type") in ("linear", "yarn") and rs.get("factor"):
        w.add_kv(f"{arch}.rope.scaling.type", rs["type"])
        w.add_kv(f"{arch}.rope.scaling.factor", float(rs["factor"]))
        if rs.get("original_max_position_embeddings"):
            w.add_kv(f"{arch}.rope.scaling.original_context_length",
                     rs["original_max_position_embeddings"])
    if spec.kv is not None:
        spec.kv(w, hf, d)
    _write_tokenizer(w, src_dir, hf)

    default_t, out_t = FTYPES[ftype.upper()]
    n = 0

    def emit(name, data, ne=None):
        nonlocal n
        t = _target_type(name, ne or tuple(reversed(data.shape)),
                         default_t, out_t)
        flat = data.reshape(-1, data.shape[-1])
        enc, t = _encode(flat, t)
        if t in (GGMLType.F32, GGMLType.F16):
            enc = enc.reshape(data.shape) if ne is None else enc
            w.add_tensor(name, enc, ne=ne, ggml_type=t if ne else None)
        else:
            w.add_tensor(name, enc, ne=ne or tuple(reversed(data.shape)),
                         ggml_type=t)
        n += 1
        print(f"[{n:4d}] {name} ({t.name})", file=logfile)

    state: dict = {}
    for hf_name, data in _iter_hf_tensors(src_dir):
        outs = None
        if spec.transform is not None:
            outs = spec.transform(hf_name, data, hf, d, state)
        if outs is None:
            name = _rename(spec, hf_name)
            outs = [] if name is None else [(name, data)]
        for out in outs:
            emit(*out)
    if spec.finish is not None:
        for out in spec.finish(hf, d, state):
            emit(*out)
    w.write()
    return n


# ---------------------------------------------------------------------------
# llama-shaped name fragments shared by several specs

_LLAMA_TOP = [
    ("model.embed_tokens.weight", "token_embd.weight"),
    ("model.norm.weight", "output_norm.weight"),
    ("model.norm.bias", "output_norm.bias"),
    ("lm_head.weight", "output.weight"),
]
_LLAMA_LAYER = [
    ("input_layernorm.weight", "attn_norm.weight"),
    ("input_layernorm.bias", "attn_norm.bias"),
    ("self_attn.q_proj.weight", "attn_q.weight"),
    ("self_attn.k_proj.weight", "attn_k.weight"),
    ("self_attn.v_proj.weight", "attn_v.weight"),
    ("self_attn.o_proj.weight", "attn_output.weight"),
    ("post_attention_layernorm.weight", "ffn_norm.weight"),
    ("post_attention_layernorm.bias", "ffn_norm.bias"),
    ("mlp.gate_proj.weight", "ffn_gate.weight"),
    ("mlp.up_proj.weight", "ffn_up.weight"),
    ("mlp.down_proj.weight", "ffn_down.weight"),
]


def _llama_permute_transform(hf_name, data, hf, d, state):
    """Permute q/k to GGUF NORM-rope order, defer the rest to the maps."""
    if hf_name.endswith("self_attn.q_proj.weight"):
        idx = hf_name.split(".")[2]
        return [(f"blk.{idx}.attn_q.weight", _permute_qk(data, d["n_heads"]))]
    if hf_name.endswith("self_attn.k_proj.weight"):
        idx = hf_name.split(".")[2]
        return [(f"blk.{idx}.attn_k.weight", _permute_qk(data, d["n_kv"]))]
    return None


def _baichuan_transform(hf_name, data, hf, d, state):
    """Split the fused W_pack into permuted q/k + v (BaichuanModel
    modify_tensors — _reverse_hf_permute_part)."""
    if hf_name.endswith("self_attn.W_pack.weight"):
        idx = hf_name.split(".")[2]
        r = data.shape[0] // 3
        return [
            (f"blk.{idx}.attn_q.weight", _permute_qk(data[:r], d["n_heads"])),
            (f"blk.{idx}.attn_k.weight", _permute_qk(data[r:2 * r], d["n_kv"])),
            (f"blk.{idx}.attn_v.weight", data[2 * r:]),
        ]
    return None


def _internlm2_transform(hf_name, data, hf, d, state):
    """Split the grouped wqkv layout: (groups, q_per_kv+2, hd, n_embd) ->
    permuted q/k + v (InternLM2Model modify_tensors @2490)."""
    if ".attention.wqkv." in hf_name:
        idx = hf_name.split(".")[2]
        q_per_kv = d["n_heads"] // d["n_kv"]
        hd = d["head_dim"]
        qkv = data.reshape(d["n_kv"], q_per_kv + 2, hd, d["n_embd"])
        q = qkv[:, :q_per_kv].reshape(-1, d["n_embd"])
        k = qkv[:, -2].reshape(-1, d["n_embd"])
        v = qkv[:, -1].reshape(-1, d["n_embd"])
        return [
            (f"blk.{idx}.attn_q.weight", _permute_qk(q, d["n_heads"])),
            (f"blk.{idx}.attn_k.weight", _permute_qk(k, d["n_kv"])),
            (f"blk.{idx}.attn_v.weight", v),
        ]
    return None


_SPECS: dict[str, ArchSpec] = {}


def _register(cls_names, spec: ArchSpec) -> None:
    for c in ([cls_names] if isinstance(cls_names, str) else cls_names):
        _SPECS[c] = spec


_register(["BaichuanForCausalLM", "BaiChuanForCausalLM"], ArchSpec(
    arch="baichuan",
    top=_LLAMA_TOP, layer=_LLAMA_LAYER,
    transform=_baichuan_transform,
))

_register("XverseForCausalLM", ArchSpec(
    arch="xverse",
    top=_LLAMA_TOP, layer=_LLAMA_LAYER,
    transform=_llama_permute_transform,
))

# note: the reference converter does NOT permute orion q/k (OrionModel has
# no modify_tensors) — mirror that; eps comes from rms_norm_eps but the
# model is LayerNorm (OrionModel set_gguf_parameters comment)
_register("OrionForCausalLM", ArchSpec(
    arch="orion",
    top=_LLAMA_TOP, layer=_LLAMA_LAYER,
    eps_key="ln",
))

_register("InternLM2ForCausalLM", ArchSpec(
    arch="internlm2",
    top=[("model.tok_embeddings.weight", "token_embd.weight"),
         ("model.norm.weight", "output_norm.weight"),
         ("output.weight", "output.weight")],
    layer=[("attention_norm.weight", "attn_norm.weight"),
           ("attention.wo.weight", "attn_output.weight"),
           ("ffn_norm.weight", "ffn_norm.weight"),
           ("feed_forward.w1.weight", "ffn_gate.weight"),
           ("feed_forward.w3.weight", "ffn_up.weight"),
           ("feed_forward.w2.weight", "ffn_down.weight")],
    transform=_internlm2_transform,
))

_register("MiniCPMForCausalLM", ArchSpec(
    arch="minicpm",
    top=_LLAMA_TOP, layer=_LLAMA_LAYER,
    transform=_llama_permute_transform,
    # newer MiniCPM configs carry the scale knobs; the reference hardcodes
    # them in build_minicpm (scale_embd=12, scale_depth=1.4, base=256)
    kv=lambda w, hf, d: [
        w.add_kv("minicpm.embedding_scale", float(hf.get("scale_emb", 12.0))),
        w.add_kv("minicpm.residual_scale",
                 float(hf.get("scale_depth", 1.4)) / d["n_layers"] ** 0.5),
        w.add_kv("minicpm.logit_scale",
                 float(hf.get("dim_model_base", 256)) / d["n_embd"]),
    ] and None,
))

# ---------------------------------------------------------------------------
# batch 2: refact / plamo / codeshell / jais / chatglm / chameleon
# (reference converter classes RefactModel @1362, PlamoModel @2262,
#  CodeShellModel @2310, JaisModel @3731, ChatGLMModel @3820,
#  ChameleonModel @4172 in convert_hf_to_gguf.py)


def _refact_ff(n_embd: int) -> int:
    """Refact's implied FFN width (RefactModel set_gguf_parameters)."""
    hidden = int(2 * (4 * n_embd) / 3)
    return 256 * ((hidden + 255) // 256)


def _refact_derive(hf, d):
    d["n_kv"] = 1  # multi-query attention, not in config.json
    d["n_ff"] = _refact_ff(d["n_embd"])


def _refact_transform(hf_name, data, hf, d, state):
    if ".attn.kv.weight" in hf_name:
        idx = hf_name.split(".")[2]
        hd = d["head_dim"]
        return [(f"blk.{idx}.attn_k.weight", data[:hd]),
                (f"blk.{idx}.attn_v.weight", data[hd:])]
    if ".mlp.gate_up_proj.weight" in hf_name:
        idx = hf_name.split(".")[2]
        ff = d["n_ff"]
        return [(f"blk.{idx}.ffn_gate.weight", data[:ff]),
                (f"blk.{idx}.ffn_up.weight", data[ff:])]
    return None


_register("GPTRefactForCausalLM", ArchSpec(
    arch="refact",
    layer_prefix="transformer.h.",
    top=[("transformer.wte.weight", "token_embd.weight"),
         ("ln_f.weight", "output_norm.weight"),
         ("lm_head.weight", "output.weight")],
    layer=[("ln_1.weight", "attn_norm.weight"),
           ("ln_2.weight", "ffn_norm.weight"),
           ("attn.q.weight", "attn_q.weight"),
           ("attn.c_proj.weight", "attn_output.weight"),
           ("mlp.linear_1.weight", "ffn_gate.weight"),
           ("mlp.linear_3.weight", "ffn_up.weight"),
           ("mlp.c_proj.weight", "ffn_down.weight")],
    derive=_refact_derive,
    transform=_refact_transform,
))


def _plamo_derive(hf, d):
    # plamo-13b's config.json carries a wrong num_key_value_heads; the
    # reference hardcodes 5 for the 40-head/5120-wide model (PlamoModel
    # set_gguf_parameters comment) — special-case that shape only.
    if d["n_embd"] == 5120 and d["n_heads"] == 40:
        d["n_kv"] = 5


def _plamo_transform(hf_name, data, hf, d, state):
    """De-interleave q heads across kv groups (PlamoModel shuffle_attn_*):
    HF head a*n_kv+b -> GGUF head b*q_per_kv+a, inverse on o_proj cols."""
    nh, nkv, hd, ne = d["n_heads"], d["n_kv"], d["head_dim"], d["n_embd"]
    qpk = nh // nkv
    idx = hf_name.split(".")[3] if hf_name.count(".") > 3 else "?"
    if hf_name.endswith("self_attn.q_proj.weight"):
        q = (data.reshape(qpk, nkv, hd, ne).transpose(1, 0, 2, 3)
             .reshape(nh * hd, ne))
        return [(f"blk.{idx}.attn_q.weight", q)]
    if hf_name.endswith("self_attn.o_proj.weight"):
        o = (data.reshape(ne, qpk, nkv, hd).transpose(0, 2, 1, 3)
             .reshape(ne, nh * hd))
        return [(f"blk.{idx}.attn_output.weight", o)]
    return None


_register("PlamoForCausalLM", ArchSpec(
    arch="plamo",
    layer_prefix="model.layers.layers.",
    top=[("model.embed_tokens.weight", "token_embd.weight"),
         ("model.norm.weight", "output_norm.weight"),
         ("lm_head.weight", "output.weight")],
    layer=[("norm.weight", "attn_norm.weight"),  # shared attn+ffn norm
           ("self_attn.k_proj.weight", "attn_k.weight"),
           ("self_attn.v_proj.weight", "attn_v.weight"),
           ("mlp.gate_proj.weight", "ffn_gate.weight"),
           ("mlp.up_proj.weight", "ffn_up.weight"),
           ("mlp.down_proj.weight", "ffn_down.weight")],
    derive=_plamo_derive,
    transform=_plamo_transform,
))


def _codeshell_derive(hf, d):
    d["n_ff"] = int(hf.get("n_inner") or 0) or 4 * d["n_embd"]


def _codeshell_transform(hf_name, data, hf, d, state):
    if hf_name == "transformer.wte.weight":
        state["embd"] = data
        return [("token_embd.weight", data)]
    if hf_name in ("lm_head.weight", "output.weight"):
        state["has_output"] = True
        return [("output.weight", data)]
    return None


def _codeshell_finish(hf, d, state):
    # tied output head: reference copies tok_embd into output.weight when
    # the checkpoint ships neither lm_head nor output (CodeShellModel)
    if not state.get("has_output") and "embd" in state:
        yield ("output.weight", state["embd"])


_register("CodeShellForCausalLM", ArchSpec(
    arch="codeshell",
    layer_prefix="transformer.h.",
    eps_key="ln",
    top=[("transformer.ln_f.weight", "output_norm.weight"),
         ("transformer.ln_f.bias", "output_norm.bias")],
    layer=[("ln_1.weight", "attn_norm.weight"),
           ("ln_1.bias", "attn_norm.bias"),
           ("attn.c_attn.weight", "attn_qkv.weight"),
           ("attn.c_attn.bias", "attn_qkv.bias"),
           ("attn.c_proj.weight", "attn_output.weight"),
           ("attn.c_proj.bias", "attn_output.bias"),
           ("ln_2.weight", "ffn_norm.weight"),
           ("ln_2.bias", "ffn_norm.bias"),
           ("mlp.c_fc.weight", "ffn_up.weight"),
           ("mlp.c_fc.bias", "ffn_up.bias"),
           ("mlp.c_proj.weight", "ffn_down.weight"),
           ("mlp.c_proj.bias", "ffn_down.bias")],
    derive=_codeshell_derive,
    transform=_codeshell_transform,
    finish=_codeshell_finish,
))


def _jais_transform(hf_name, data, hf, d, state):
    """gpt2-style Conv1D weights are stored (in, out): transpose the four
    projection weights; scale wte/output by the muP factors (JaisModel)."""
    if hf_name.endswith((".attn.bias", ".attn.masked_bias",
                         "relative_pe.slopes")):
        return []  # causal-mask buffers / precomputed ALiBi slopes
    emb_scale = float(hf.get("mup_embeddings_scale")
                      or hf.get("embeddings_scale") or 1.0)
    width = 1.0
    if hf.get("mup_output_alpha") is not None:
        width = float(hf["mup_output_alpha"]) * float(hf["mup_width_scale"])
    elif hf.get("width_scale") is not None:
        width = float(hf["width_scale"])
    if hf_name == "transformer.wte.weight":
        outs = [("token_embd.weight", data * emb_scale)]
        if hf.get("mup_embeddings_scale") is not None:
            # mup flavors tie the output head to wte, scaled differently
            outs.append(("output.weight", data * width))
        return outs
    if hf_name == "lm_head.weight":
        return [("output.weight", data * width)]
    if hf_name.endswith((".attn.c_attn.weight", ".attn.c_proj.weight",
                         ".mlp.c_fc.weight", ".mlp.c_fc2.weight",
                         ".mlp.c_proj.weight")):
        idx = hf_name.split(".")[2]
        suffix = {"c_attn": "attn_qkv.weight", "c_fc": "ffn_up.weight",
                  "c_fc2": "ffn_gate.weight"}.get(hf_name.split(".")[-2])
        if suffix is None:
            suffix = ("attn_output.weight" if ".attn." in hf_name
                      else "ffn_down.weight")
        return [(f"blk.{idx}.{suffix}", np.ascontiguousarray(data.T))]
    return None


_register("JAISLMHeadModel", ArchSpec(
    arch="jais",
    layer_prefix="transformer.h.",
    eps_key="ln",
    top=[("transformer.ln_f.weight", "output_norm.weight"),
         ("transformer.ln_f.bias", "output_norm.bias")],
    layer=[("ln_1.weight", "attn_norm.weight"),
           ("ln_1.bias", "attn_norm.bias"),
           ("attn.c_attn.bias", "attn_qkv.bias"),
           ("attn.c_proj.bias", "attn_output.bias"),
           ("ln_2.weight", "ffn_norm.weight"),
           ("ln_2.bias", "ffn_norm.bias"),
           ("mlp.c_fc.bias", "ffn_up.bias"),
           ("mlp.c_fc2.bias", "ffn_gate.bias"),
           ("mlp.c_proj.bias", "ffn_down.bias")],
    transform=_jais_transform,
    # all public JAIS checkpoints precompute slopes for max_alibi_bias=8
    # (the runtime hardcodes 8.0 too, models/config.py jais branch)
    kv=lambda w, hf, d: w.add_kv("jais.attention.max_alibi_bias", 8.0),
))


def _chatglm_derive(hf, d):
    # generic-block inputs that chatglm spells differently: rope base is
    # 10000*rope_ratio, rotary dim is half the head dim (ChatGLMModel
    # writes 64 for the 128-wide heads), vocab may only be padded_
    hf.setdefault("rope_theta", 10000.0 * float(hf.get("rope_ratio", 1.0)))
    hf.setdefault("partial_rotary_factor", 0.5)
    if hf.get("padded_vocab_size") and not hf.get("vocab_size"):
        hf["vocab_size"] = hf["padded_vocab_size"]


_register(["ChatGLMModel", "ChatGLMForConditionalGeneration"], ArchSpec(
    arch="chatglm",
    layer_prefix="transformer.encoder.layers.",
    top=[("transformer.embedding.word_embeddings.weight",
          "token_embd.weight"),
         ("transformer.encoder.final_layernorm.weight",
          "output_norm.weight"),
         ("transformer.output_layer.weight", "output.weight")],
    layer=[("input_layernorm.weight", "attn_norm.weight"),
           ("self_attention.query_key_value.weight", "attn_qkv.weight"),
           ("self_attention.query_key_value.bias", "attn_qkv.bias"),
           ("self_attention.dense.weight", "attn_output.weight"),
           ("post_attention_layernorm.weight", "ffn_norm.weight"),
           # dense_h_to_4h holds [gate|up]; the runtime splits it
           # (LLM_FFN_SWIGLU, build_chatglm)
           ("mlp.dense_h_to_4h.weight", "ffn_up.weight"),
           ("mlp.dense_4h_to_h.weight", "ffn_down.weight")],
    derive=_chatglm_derive,
))


def _chameleon_qk_norm(data, hd):
    """Per-head norm params: reference takes head 0, un-interleaves the
    rotary halves, and replicates across heads (ChameleonModel
    _reverse_hf_permute) — we emit the shared (hd,) row the runtime
    broadcasts over heads."""
    row = np.asarray(data).reshape(-1, hd)[0]
    return np.ascontiguousarray(row.reshape(2, hd // 2).T.reshape(-1))


def _chameleon_transform(hf_name, data, hf, d, state):
    if hf_name.startswith("model.vqmodel"):
        return []  # image tokenizer: not converted (reference skips too)
    base = _llama_permute_transform(hf_name, data, hf, d, state)
    if base is not None:
        return base
    for part, gg in (("q_norm", "attn_q_norm"), ("k_norm", "attn_k_norm")):
        for kind in ("weight", "bias"):
            if hf_name.endswith(f"self_attn.{part}.{kind}"):
                idx = hf_name.split(".")[2]
                return [(f"blk.{idx}.{gg}.{kind}",
                         _chameleon_qk_norm(data, d["head_dim"]))]
    return None


_register("ChameleonForCausalLM", ArchSpec(
    arch="chameleon",
    top=_LLAMA_TOP, layer=_LLAMA_LAYER,
    transform=_chameleon_transform,
    kv=lambda w, hf, d: w.add_kv("chameleon.swin_norm",
                                 bool(hf.get("swin_norm", False))),
))


_register("ExaoneForCausalLM", ArchSpec(
    arch="exaone",
    top=[("transformer.wte.weight", "token_embd.weight"),
         ("transformer.ln_f.weight", "output_norm.weight"),
         ("lm_head.weight", "output.weight")],
    layer_prefix="transformer.h.",
    layer=[("ln_1.weight", "attn_norm.weight"),
           ("attn.attention.q_proj.weight", "attn_q.weight"),
           ("attn.attention.k_proj.weight", "attn_k.weight"),
           ("attn.attention.v_proj.weight", "attn_v.weight"),
           ("attn.attention.out_proj.weight", "attn_output.weight"),
           ("ln_2.weight", "ffn_norm.weight"),
           ("mlp.c_fc_0.weight", "ffn_gate.weight"),
           ("mlp.c_fc_1.weight", "ffn_up.weight"),
           ("mlp.c_proj.weight", "ffn_down.weight")],
))
