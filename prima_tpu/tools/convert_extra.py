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
               or n_heads or 0)
    n_layers = int(hf.get("num_hidden_layers") or hf.get("n_layer")
                   or hf.get("n_layers") or hf.get("num_layers") or 0)
    return {
        "n_embd": n_embd, "n_heads": n_heads, "n_kv": n_kv,
        "n_layers": n_layers,
        "head_dim": (n_embd // n_heads) if n_heads else 0,
        "n_ff": int(hf.get("intermediate_size") or hf.get("n_inner")
                    or (4 * n_embd)),
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
                or hf.get("layer_norm_eps") or hf.get("norm_eps") or 1e-5)
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
