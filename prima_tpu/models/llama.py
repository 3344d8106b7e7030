"""Llama / Qwen2 model: GGUF weight loading + functional forward pass.

The forward is a pure function over a params pytree — jit/pjit-friendly,
layers indexable for pipeline windows (the TPU analogue of the reference's
per-window subgraphs, llama_build_graph src/llama.cpp:16953).

Weight names follow the GGUF convention written by convert_hf_to_gguf
(token_embd / blk.N.attn_q / ... / output_norm / output), loaded rank-aware
like llm_load_llama_tensors (src/llama.cpp:7356) / llm_load_qwen2_tensors
(@7475) when a layer filter is given.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType, TYPE_TRAITS
from ..gguf.reader import GGUFModel, TensorInfo
from ..ops.layers import (alibi_mask, apply_rope, causal_mask, gated_act,
                          gqa_attention, rms_norm, rope_freqs, swiglu)
from ..quant.dequant_jax import QTensor, dequant, qmatmul_xla
from ..quant.device_format import SUPPORTED_TYPES, UQTensor as _UQ, to_device_format
from .config import ModelConfig

# ---------------------------------------------------------------------------
# Linear dispatch: dense jax arrays or QTensors
# ---------------------------------------------------------------------------

_MATMUL_IMPL: dict[str, Callable] = {"xla": qmatmul_xla}


def register_matmul_impl(name: str, fn: Callable) -> None:
    _MATMUL_IMPL[name] = fn


def linear(x: jax.Array, w, impl: str = "xla") -> jax.Array:
    """x: (..., K) @ W(rows, K)^T -> (..., rows)."""
    if isinstance(w, QTensor):
        return _MATMUL_IMPL[impl](x, w)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def linear_l(layer: dict, name: str, x: jax.Array, impl: str = "xla") -> jax.Array:
    """Layer linear with optional LoRA: y = W x + scale * B (A x)."""
    y = linear(x, layer[name], impl)
    ab = layer.get(name + "_lora")
    if ab is not None:
        from .adapters import lora_delta

        for t in (ab if isinstance(ab, list) else [ab]):
            y = y + lora_delta(x, t)
    return y


def embed(tok_embd, token_ids: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Row-gather + dequant of the embedding table (quantized rows stay
    quantized in HBM; only the gathered rows are widened)."""
    if isinstance(tok_embd, QTensor):
        from ..quant.dequant_jax import dequant_rows

        return dequant_rows(tok_embd, token_ids, dtype)
    return tok_embd[token_ids].astype(dtype)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def _to_device_tensor(ti: TensorInfo, dtype, dense: bool = False):
    """GGUF tensor -> QTensor (quantized) or dense jax array."""
    from ..quant.dequant_jax import qtensor_from_raw

    t = ti.ggml_type
    tt = TYPE_TRAITS[t]
    if tt.is_quantized and not dense and t in SUPPORTED_TYPES:
        rows = ti.n_elements // ti.ne[0]
        qt = qtensor_from_raw(ti.data, t, (rows, ti.ne[0]))  # native fast path
        if qt is not None:
            return qt
        uq = to_device_format(ti.data, t, ti.ne[0])
        return QTensor.from_host(uq)
    from ..quant.dequant_np import dequantize_tensor

    return jax.device_put(dequantize_tensor(ti).astype(np.dtype(dtype)))


def _split_tensor_rows(ti: TensorInfo, dtype, bounds: Sequence[int]):
    """Split a GGUF tensor along output rows (for fused qkv / gate_up):
    raw quant blocks slice cleanly by row. Returns one tensor per range."""
    from ..quant.dequant_jax import qtensor_from_raw

    t = ti.ggml_type
    tt = TYPE_TRAITS[t]
    rows = ti.n_elements // ti.ne[0]
    k = ti.ne[0]
    if tt.is_quantized and t in SUPPORTED_TYPES:
        raw = np.asarray(ti.data).reshape(rows, -1)
        out = []
        for r0, r1 in zip(bounds[:-1], bounds[1:]):
            sl = np.ascontiguousarray(raw[r0:r1])
            qt = qtensor_from_raw(sl, t, (r1 - r0, k))
            if qt is None:
                uq = to_device_format(sl, t, k)
                qt = QTensor.from_host(uq)
            out.append(qt)
        return out
    from ..quant.dequant_np import dequantize_tensor

    full = dequantize_tensor(ti).astype(np.dtype(dtype))
    return [jax.device_put(full[r0:r1]) for r0, r1 in zip(bounds[:-1], bounds[1:])]


def _stack_expert_rows(qt, n_expert: int):
    """Reshape a (n_expert*rows, ...) tensor into a leading expert axis so
    experts index with [e] (dynamic-slice under jit)."""
    if isinstance(qt, QTensor):
        def r(a):
            return (a.reshape((n_expert, a.shape[0] // n_expert) + a.shape[1:])
                    if a is not None else None)

        return QTensor(qs=r(qt.qs), scales=r(qt.scales), mins=r(qt.mins),
                       sub=qt.sub, layout=qt.layout, q_offset=qt.q_offset,
                       shape=(qt.shape[0] // n_expert, qt.shape[1]),
                       kperm=qt.kperm, d=r(qt.d), dmin=r(qt.dmin),
                       gsub=qt.gsub, packed=qt.packed)
    if qt.ndim == 3 and qt.shape[0] == n_expert:
        return qt  # dense tensors keep their GGUF 3D shape
    return qt.reshape((n_expert, qt.shape[0] // n_expert) + qt.shape[1:])


def _fuse_tensor_rows(tis: Sequence[TensorInfo]):
    """Concatenate GGUF tensors along output rows at the RAW quant-block
    level (quant blocks slice/stack cleanly by row). Returns one QTensor,
    or None when the tensors can't fuse (type mismatch, unsupported, or
    non-quantized) — callers fall back to separate tensors."""
    from ..quant.dequant_jax import qtensor_from_raw

    t0 = tis[0].ggml_type
    k = tis[0].ne[0]
    if not all(ti.ggml_type == t0 and ti.ne[0] == k for ti in tis):
        return None
    if not (TYPE_TRAITS[t0].is_quantized and t0 in SUPPORTED_TYPES):
        return None
    rows = [ti.n_elements // k for ti in tis]
    raw = np.ascontiguousarray(np.concatenate(
        [np.asarray(ti.data).reshape(r, -1) for ti, r in zip(tis, rows)]))
    qt = qtensor_from_raw(raw, t0, (sum(rows), k))
    if qt is None:
        uq = to_device_format(raw, t0, k)
        qt = QTensor.from_host(uq)
    return qt


def load_params(
    m: GGUFModel,
    cfg: ModelConfig,
    dtype=jnp.bfloat16,
    layer_filter: Callable[[int], bool] | None = None,
    with_embedding: bool = True,
    with_output: bool = True,
    fuse: bool = False,
) -> dict:
    """Build the params pytree from a GGUF model.

    layer_filter(i) -> False skips layer i (rank-aware loading: the analogue
    of this_layer_is_mine, src/llama.cpp:3838 — unowned layers are None).
    Per-arch tensor tables mirror llm_load_llama_tensors (src/llama.cpp:7356),
    llm_load_qwen2_tensors (@7475), and the gemma/gemma2/phi3 loaders.

    fuse=True concatenates Q/K/V (and gate/up) into single wqkv / w_gateup
    tensors at the raw quant-block level where the per-tensor quant types
    match: one fused kernel launch streams all three weights, the decode
    step's launch count drops from 7 to 4 GEMVs per layer. Mixed-type
    layers (e.g. Q4_K_M's Q6_K attn_v) keep separate tensors — numerics
    are identical either way.
    """
    t = m.tensors

    def get(name, dense=False, required=True):
        ti = t.get(name)
        if ti is None:
            if required:
                raise KeyError(f"missing tensor {name}")
            return None
        return _to_device_tensor(ti, dtype, dense)

    h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    params: dict[str, Any] = {"layers": []}
    if with_embedding:
        params["tok_embd"] = get("token_embd.weight")
        pe = get("position_embd.weight", dense=True, required=False)
        if pe is not None:
            params["pos_embd"] = pe
        ten = get("token_embd_norm.weight", dense=True, required=False)
        if ten is not None:
            params["tok_embd_norm"] = ten
            tnb = get("token_embd_norm.bias", dense=True, required=False)
            if tnb is not None:
                params["tok_embd_norm_b"] = tnb
    for i in range(cfg.n_layers):
        if layer_filter is not None and not layer_filter(i):
            params["layers"].append(None)
            continue
        p = f"blk.{i}."
        ln = cfg.norm_type != "rms"
        layer = {
            # LN archs may omit norm weights entirely (OLMo's non-parametric
            # LLM_NORM) or the ffn_norm (command-r's parallel block)
            "attn_norm": get(p + "attn_norm.weight", dense=True,
                             required=not ln),
            "wo": get(p + "attn_output.weight"),
            "ffn_norm": get(p + "ffn_norm.weight", dense=True,
                            required=not (ln or cfg.parallel_block)),
        }
        if layer["ffn_norm"] is None and (p + "attn_out_norm.weight") in t:
            # dbrx: the pre-MoE norm is named attn_out_norm
            layer["ffn_norm"] = get(p + "attn_out_norm.weight", dense=True)
        if (p + "attn_norm_2.weight") in t:
            # falcon-40b style: a second LayerNorm feeding the parallel MLP
            # (LLM_TENSOR_ATTN_NORM_2) — our parallel path reads "ffn_norm"
            layer["ffn_norm"] = get(p + "attn_norm_2.weight", dense=True)
            b2 = get(p + "attn_norm_2.bias", dense=True, required=False)
            if b2 is not None:
                layer["ffn_norm_b"] = b2
        if (p + "attn_qkv.weight") in t:  # phi3/openelm: fused qkv, by rows
            ti = t[p + "attn_qkv.weight"]
            hi = cfg.n_heads_arr[i] if cfg.n_heads_arr else h
            kvi = cfg.n_kv_heads_arr[i] if cfg.n_kv_heads_arr else kvh
            nq = hi * hd
            nk = kvi * hd
            layer["wq"], layer["wk"], layer["wv"] = _split_tensor_rows(
                ti, dtype, [0, nq, nq + nk, nq + 2 * nk])
        else:
            fused_qkv = None
            if fuse and not (cfg.n_heads_arr or cfg.n_kv_heads_arr):
                fused_qkv = _fuse_tensor_rows(
                    [t[p + "attn_q.weight"], t[p + "attn_k.weight"],
                     t[p + "attn_v.weight"]])
            if fused_qkv is not None:
                # never store a None under the key: a None leaf would
                # disable the stacked-scan fast path for the whole model
                layer["wqkv"] = fused_qkv
            else:
                layer["wq"] = get(p + "attn_q.weight")
                layer["wk"] = get(p + "attn_k.weight")
                layer["wv"] = get(p + "attn_v.weight")
        if cfg.n_expert and (p + "ffn_gate_inp.weight") in t:
            # MoE (Mixtral): router + stacked expert tensors
            layer["ffn_gate_inp"] = get(p + "ffn_gate_inp.weight", dense=True)
            for nm, key in (("ffn_gate_exps", "ffn_gate_exps"),
                            ("ffn_up_exps", "ffn_up_exps"),
                            ("ffn_down_exps", "ffn_down_exps")):
                layer[key] = _stack_expert_rows(get(p + nm + ".weight"),
                                                cfg.n_expert)
            if (p + "ffn_gate_inp_shexp.weight") in t:  # qwen2moe
                layer["ffn_gate_inp_shexp"] = get(
                    p + "ffn_gate_inp_shexp.weight", dense=True)
                layer["ffn_gate_shexp"] = get(p + "ffn_gate_shexp.weight")
                layer["ffn_up_shexp"] = get(p + "ffn_up_shexp.weight")
                layer["ffn_down_shexp"] = get(p + "ffn_down_shexp.weight")
            layer["w_gate"] = layer["w_up"] = layer["w_down"] = None
            if cfg.moe_parallel_dense:  # arctic: dense FFN rides alongside
                layer["w_gate"] = get(p + "ffn_gate.weight", required=False)
                layer["w_up"] = get(p + "ffn_up.weight", required=False)
                layer["w_down"] = get(p + "ffn_down.weight", required=False)
                layer["ffn_norm_exps"] = get(p + "ffn_norm_exps.weight",
                                             dense=True, required=False)
        elif not cfg.ffn_gated:
            # starcoder2: plain up -> act -> down MLP, no gate projection
            layer["w_gate"] = None
            layer["w_up"] = get(p + "ffn_up.weight")
            layer["w_down"] = get(p + "ffn_down.weight")
        elif (p + "ffn_gate.weight") not in t and (p + "ffn_up.weight") in t:
            # phi3: fused gate+up (rows [0, n_ff) = gate, [n_ff, 2n_ff) = up)
            ti = t[p + "ffn_up.weight"]
            layer["w_gate"], layer["w_up"] = _split_tensor_rows(
                ti, dtype, [0, cfg.n_ff, 2 * cfg.n_ff])
            layer["w_down"] = get(p + "ffn_down.weight")
        else:
            # the fused-FFN kernel path applies no per-tensor biases/scales
            # and no bitnet sub-norm (jais b_gate/b_up, bitnet *.scale +
            # ffn_sub_norm) — only fuse in their absence
            fused_gu = None
            if fuse and not any(
                    (p + n) in t for n in ("ffn_gate.bias", "ffn_up.bias",
                                           "ffn_gate.scale", "ffn_up.scale",
                                           "ffn_down.scale",
                                           "ffn_sub_norm.weight")):
                fused_gu = _fuse_tensor_rows(
                    [t[p + "ffn_gate.weight"], t[p + "ffn_up.weight"]])
            if fused_gu is not None:
                layer["w_gateup"] = fused_gu
            else:
                layer["w_gate"] = get(p + "ffn_gate.weight")
                layer["w_up"] = get(p + "ffn_up.weight")
            layer["w_down"] = get(p + "ffn_down.weight")
        if cfg.post_norms:  # gemma2 / grok (different tensor names)
            layer["attn_post_norm"] = get(p + "post_attention_norm.weight",
                                          dense=True, required=False)
            if layer["attn_post_norm"] is None:
                layer["attn_post_norm"] = get(p + "attn_out_norm.weight",
                                              dense=True, required=False)
            layer["ffn_post_norm"] = get(p + "post_ffw_norm.weight",
                                         dense=True, required=False)
            if layer["ffn_post_norm"] is None:
                layer["ffn_post_norm"] = get(p + "layer_output_norm.weight",
                                             dense=True, required=False)
            if layer["ffn_post_norm"] is None:
                layer["ffn_post_norm"] = get(p + "layer_out_norm.weight",
                                             dense=True, required=False)
        if (p + "attn_qkv.bias") in t:  # phi2: fused qkv bias
            bqkv = np.asarray(_to_device_tensor(t[p + "attn_qkv.bias"],
                                                dtype, True))
            nq, nk = h * hd, kvh * hd
            layer["bq"] = jnp.asarray(bqkv[:nq])
            layer["bk"] = jnp.asarray(bqkv[nq : nq + nk])
            layer["bv"] = jnp.asarray(bqkv[nq + nk : nq + 2 * nk])
        elif cfg.qkv_bias or (p + "attn_q.bias") in t:
            layer["bq"] = get(p + "attn_q.bias", dense=True)
            layer["bk"] = get(p + "attn_k.bias", dense=True)
            layer["bv"] = get(p + "attn_v.bias", dense=True)
        for bname, key in (("attn_q_norm.weight", "attn_q_norm"),
                           ("attn_k_norm.weight", "attn_k_norm"),
                           ("attn_q_norm.bias", "attn_q_norm_b"),
                           ("attn_k_norm.bias", "attn_k_norm_b"),
                           ("attn_norm.bias", "attn_norm_b"),
                           ("ffn_norm.bias", "ffn_norm_b"),
                           ("attn_output.bias", "bo"),
                           ("ffn_up.bias", "b_up"),
                           ("ffn_gate.bias", "b_gate"),
                           ("ffn_down.bias", "b_down"),
                           # bitnet: RMS sub-norms + per-tensor scales
                           ("attn_sub_norm.weight", "attn_sub_norm"),
                           ("ffn_sub_norm.weight", "ffn_sub_norm"),
                           ("attn_q.scale", "wq_scale"),
                           ("attn_k.scale", "wk_scale"),
                           ("attn_v.scale", "wv_scale"),
                           ("attn_output.scale", "wo_scale"),
                           ("ffn_up.scale", "w_up_scale"),
                           ("ffn_gate.scale", "w_gate_scale"),
                           ("ffn_down.scale", "w_down_scale")):
            b = get(p + bname, dense=True, required=False)
            if b is not None:
                layer[key] = b
        params["layers"].append(layer)
    if with_output:
        params["output_norm"] = get("output_norm.weight", dense=True,
                                    required=cfg.norm_type == "rms")
        onb = get("output_norm.bias", dense=True, required=False)
        if onb is not None:
            params["output_norm_b"] = onb
        params["output"] = None if cfg.tie_embeddings else get("output.weight")
        ob = get("output.bias", dense=True, required=False)
        if ob is not None:  # phi2 biased lm_head
            params["output_b"] = ob
    return params


def fuse_uq_rows(tensors: list) -> "object":
    """Concatenate host UQTensors along output rows (fused QKV / gate-up).
    All must share (k, layout, sub, gsub, ggml_type)."""
    import numpy as _np

    from ..quant.device_format import UQTensor

    u0 = tensors[0]
    assert all(t.layout == u0.layout and t.sub == u0.sub
               and t.gsub == u0.gsub and t.shape[1] == u0.shape[1]
               for t in tensors)
    cat = lambda f: (_np.concatenate([getattr(t, f) for t in tensors], axis=0)
                     if getattr(u0, f) is not None else None)
    rows = sum(t.shape[0] for t in tensors)
    return UQTensor(qs=cat("qs"), scales=cat("scales"), mins=cat("mins"),
                    sub=u0.sub, layout=u0.layout, q_offset=u0.q_offset,
                    ggml_type=u0.ggml_type, shape=(rows, u0.shape[1]),
                    d=cat("d"), dmin=cat("dmin"), gsub=u0.gsub)


def synth_params_device_stacked(cfg: ModelConfig,
                                ggml_type: GGMLType = GGMLType.Q4_K,
                                seed: int = 0, fused: bool = False) -> dict:
    """Device-synthesized params with the per-layer tensors STACKED along a
    leading layer axis (for forward_scan): the synth program compiles once
    for ONE layer (vmapped over per-layer keys) instead of n_layers times —
    ~20x faster first-run on remote-compile TPU runtimes."""
    key = jax.random.PRNGKey(seed)
    e, h, kvh, hd, f = cfg.n_embd, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.n_ff
    khead, klayers = jax.random.split(key)

    def one_layer(k):
        ks = jax.random.split(k, 7)
        if fused:
            return {
                "attn_norm": jnp.ones(e, jnp.float32),
                "wqkv": synth_qtensor_device(ks[0], (h + 2 * kvh) * hd, e,
                                             ggml_type),
                "wo": synth_qtensor_device(ks[3], e, h * hd, ggml_type),
                "ffn_norm": jnp.ones(e, jnp.float32),
                "w_gateup": synth_qtensor_device(ks[4], 2 * f, e, ggml_type),
                "w_down": synth_qtensor_device(ks[6], e, f, ggml_type),
            }
        return {
            "attn_norm": jnp.ones(e, jnp.float32),
            "wq": synth_qtensor_device(ks[0], h * hd, e, ggml_type),
            "wk": synth_qtensor_device(ks[1], kvh * hd, e, ggml_type),
            "wv": synth_qtensor_device(ks[2], kvh * hd, e, ggml_type),
            "wo": synth_qtensor_device(ks[3], e, h * hd, ggml_type),
            "ffn_norm": jnp.ones(e, jnp.float32),
            "w_gate": synth_qtensor_device(ks[4], f, e, ggml_type),
            "w_up": synth_qtensor_device(ks[5], f, e, ggml_type),
            "w_down": synth_qtensor_device(ks[6], e, f, ggml_type),
        }

    layers = jax.vmap(one_layer)(jax.random.split(klayers, cfg.n_layers))
    k1, k2 = jax.random.split(khead)
    return {
        "tok_embd": synth_qtensor_device(k1, cfg.n_vocab, e, ggml_type),
        "layers": layers,  # stacked dict, not a list
        "output_norm": jnp.ones(e, jnp.float32),
        "output": None if cfg.tie_embeddings
        else synth_qtensor_device(k2, cfg.n_vocab, e, ggml_type),
    }


def synth_params_device_unrolled(cfg: ModelConfig,
                                 ggml_type: GGMLType = GGMLType.Q4_K,
                                 seed: int = 0, fused: bool = False) -> dict:
    """Device-synthesized params as a per-layer LIST (the forward() layout)
    with O(one layer) peak extra HBM: ONE compiled single-layer program is
    reused n_layers times. The stacked-synth + unstack route doubles peak
    memory (two full weight copies), which rules it out for models near
    HBM capacity — e.g. the 32B-class bench row on a 16 GB chip."""
    key = jax.random.PRNGKey(seed)
    e, h, kvh, hd, f = (cfg.n_embd, cfg.n_heads, cfg.n_kv_heads,
                        cfg.head_dim, cfg.n_ff)
    khead, klayers = jax.random.split(key)

    @jax.jit
    def one_layer(k):
        ks = jax.random.split(k, 7)
        if fused:
            return {
                "attn_norm": jnp.ones(e, jnp.float32),
                "wqkv": synth_qtensor_device(ks[0], (h + 2 * kvh) * hd, e,
                                             ggml_type),
                "wo": synth_qtensor_device(ks[3], e, h * hd, ggml_type),
                "ffn_norm": jnp.ones(e, jnp.float32),
                "w_gateup": synth_qtensor_device(ks[4], 2 * f, e, ggml_type),
                "w_down": synth_qtensor_device(ks[6], e, f, ggml_type),
            }
        return {
            "attn_norm": jnp.ones(e, jnp.float32),
            "wq": synth_qtensor_device(ks[0], h * hd, e, ggml_type),
            "wk": synth_qtensor_device(ks[1], kvh * hd, e, ggml_type),
            "wv": synth_qtensor_device(ks[2], kvh * hd, e, ggml_type),
            "wo": synth_qtensor_device(ks[3], e, h * hd, ggml_type),
            "ffn_norm": jnp.ones(e, jnp.float32),
            "w_gate": synth_qtensor_device(ks[4], f, e, ggml_type),
            "w_up": synth_qtensor_device(ks[5], f, e, ggml_type),
            "w_down": synth_qtensor_device(ks[6], e, f, ggml_type),
        }

    layers = [one_layer(k) for k in jax.random.split(klayers, cfg.n_layers)]
    k1, k2 = jax.random.split(khead)

    @jax.jit
    def head(k1, k2):
        return (synth_qtensor_device(k1, cfg.n_vocab, e, ggml_type),
                None if cfg.tie_embeddings
                else synth_qtensor_device(k2, cfg.n_vocab, e, ggml_type))

    tok_embd, output = head(k1, k2)
    return {
        "tok_embd": tok_embd,
        "layers": layers,
        "output_norm": jnp.ones(e, jnp.float32),
        "output": output,
    }


def init_kv_stacked(cfg: ModelConfig, batch: int, max_seq: int,
                    dtype=jnp.bfloat16):
    """(k, v) with a leading layer axis — the forward_scan cache layout."""
    shape = (cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim)
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def forward_scan(params: dict, cfg: ModelConfig, tokens, positions,
                 kv, cache_pos, opts=None, return_hidden: bool = False,
                 mask_positions: jax.Array | None = None,
                 attn_mask: jax.Array | None = None):
    """Uniform-layer forward as ONE lax.scan over stacked layer params —
    XLA compiles a single layer body regardless of depth (the fast-compile
    path for benchmarks and uniform models; the indexable forward() remains
    the general path for pipelines / MoE / per-layer masks)."""
    opts = opts or ForwardOptions()
    x = embed(params["tok_embd"], tokens, opts.dtype)
    if cfg.embd_scale != 1.0:
        x = x * np.float32(cfg.embd_scale)
    if params.get("pos_embd") is not None:  # gpt2/starcoder learned pos
        x = x + params["pos_embd"][positions].astype(x.dtype)
    if params.get("tok_embd_norm") is not None:  # bloom embedding LN
        from ..ops.layers import layer_norm

        x = layer_norm(x, params["tok_embd_norm"],
                       params.get("tok_embd_norm_b"), cfg.rms_eps)
    inv_freq, mscale = rope_freqs(cfg)
    t_cache = kv[0].shape[2]
    mpos = positions if mask_positions is None else mask_positions
    if attn_mask is not None:
        # caller-supplied additive mask (b,1,s,t) — non-causal visibility,
        # e.g. the lookahead decoder's Jacobi/verification tree. Flash
        # attention derives visibility from positions alone, so force the
        # masked attention path.
        mask = attn_mask
        if opts.attn_impl == "pallas":
            import dataclasses as _dc

            opts = _dc.replace(opts, attn_impl="xla")
    elif cfg.alibi_max_bias:  # bloom/mpt
        mask = alibi_mask(mpos, t_cache)
    else:
        mask = causal_mask(mpos, t_cache)

    def body(xc, xs):
        layer, kvl = xs
        xc, kv_new = decode_layer(layer, cfg, xc, positions, kvl, cache_pos,
                                  mask, inv_freq, mscale, opts,
                                  mask_pos=mask_positions)
        return xc, kv_new

    x, kv_out = jax.lax.scan(body, x, (params["layers"], kv))
    if return_hidden:
        return x, kv_out
    x = model_norm(x, params.get("output_norm"), params.get("output_norm_b"),
                   cfg)
    if cfg.logit_scale != 1.0:
        x = x * np.float32(cfg.logit_scale)
    w_out = params["output"] if params.get("output") is not None else params["tok_embd"]
    logits = linear(x, w_out, opts.matmul_impl).astype(opts.logits_dtype)
    if params.get("output_b") is not None:
        logits = logits + params["output_b"].astype(logits.dtype)
    if cfg.final_logit_softcap:
        cap = np.float32(cfg.final_logit_softcap)
        logits = cap * jnp.tanh(logits / cap)
    return logits, kv_out


def synth_qtensor_device(key: jax.Array, rows: int, k: int,
                         t: GGMLType = GGMLType.Q4_K) -> QTensor:
    """Random QTensor generated ON DEVICE (no host transfer) — for benchmarks
    on remote/tunneled TPUs where host->device bandwidth is the bottleneck.
    Layout/bytes identical to real weights of the same ftype; random bytes
    are permutation-invariant so kperm layout is free."""
    from ..quant.pallas.qmatmul import pallas_eligible

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    if t == GGMLType.Q4_K:
        sub, layout, off, qmax, has_mins, gsub = 32, "nib4", 0, 15, True, 8
    elif t == GGMLType.Q4_0:
        sub, layout, off, qmax, has_mins, gsub = 32, "nib4", -8, 8, False, 1
    elif t == GGMLType.Q8_0:
        sub, layout, off, qmax, has_mins, gsub = 32, "int8", 0, 127, False, 1
    elif t == GGMLType.Q6_K:
        sub, layout, off, qmax, has_mins, gsub = 16, "int8", 0, 31, False, 16
    elif t == GGMLType.Q5_K:
        sub, layout, off, qmax, has_mins, gsub = 32, "int8", 0, 31, True, 8
    else:
        raise NotImplementedError(f"device synth for {t.name}")
    if layout == "nib4":
        qs = jax.random.randint(k1, (rows, k // 2), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
    else:
        qs = jax.random.randint(k1, (rows, k), -qmax, qmax + 1, dtype=jnp.int32).astype(jnp.int8)
    s = k // sub
    if s % gsub:
        gsub = 1  # synthetic sub-superblock shapes: flat scales
    if gsub > 1:
        g = s // gsub
        kperm = pallas_eligible((rows, k), sub, layout, gsub)
        d = jnp.abs(jax.random.normal(k4, (rows, g), jnp.float32)) * (0.02 / qmax / 32) + 1e-6
        dmin = (jnp.abs(jax.random.normal(k5, (rows, g), jnp.float32)) * (0.01 / qmax / 32)
                if has_mins else None)
        if has_mins and kperm and s % 16 == 0:
            # packed native-footprint layout (host_pack docstring): 6-bit
            # codes in 1.5 B/sub-block + f16 d/dmin bit-pair per superblock
            sc = jax.random.randint(k2, (rows, s), 1, 64, dtype=jnp.int32)
            mn = jax.random.randint(k3, (rows, s), 0, 64, dtype=jnp.int32)
            a1 = (sc | ((mn >> 4) << 6)).astype(jnp.uint8)
            a2 = ((mn[:, : s // 2] & 15) | ((mn[:, s // 2 :] & 15) << 4)).astype(jnp.uint8)
            d16 = jax.lax.bitcast_convert_type(
                d.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
            dm16 = jax.lax.bitcast_convert_type(
                dmin.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
            dpair = jax.lax.bitcast_convert_type((dm16 << 16) | d16, jnp.int32)
            return QTensor(qs=qs, scales=a1, mins=a2, sub=sub, layout=layout,
                           q_offset=off, shape=(rows, k), kperm=True,
                           d=dpair, dmin=None, gsub=gsub, packed=True)
        # compact grouped layout: int8 codes + per-superblock f32 bases
        scales = jax.random.randint(k2, (rows, s), 1, 64, dtype=jnp.int32).astype(jnp.int8)
        mins = (jax.random.randint(k3, (rows, s), 0, 32, dtype=jnp.int32).astype(jnp.int8)
                if has_mins else None)
        return QTensor(qs=qs, scales=scales, mins=mins, sub=sub, layout=layout,
                       q_offset=off, shape=(rows, k), kperm=kperm,
                       d=d, dmin=dmin, gsub=gsub)
    scales = jnp.abs(jax.random.normal(k2, (rows, s), jnp.float32)) * (0.02 / qmax) + 1e-4
    mins = scales * jax.random.uniform(k3, (rows, s), jnp.float32, 0, qmax / 2) if has_mins else None
    return QTensor(qs=qs, scales=scales, mins=mins, sub=sub, layout=layout,
                   q_offset=off, shape=(rows, k),
                   kperm=pallas_eligible((rows, k), sub, layout))


def synth_params_device(cfg: ModelConfig, ggml_type: GGMLType = GGMLType.Q4_K,
                        seed: int = 0) -> dict:
    """Full random params generated on device (see synth_qtensor_device)."""
    key = jax.random.PRNGKey(seed)
    e, h, kvh, hd, f = cfg.n_embd, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.n_ff
    keys = iter(jax.random.split(key, 3 + cfg.n_layers * 12))

    def q(rows, k):
        return synth_qtensor_device(next(keys), rows, k, ggml_type)

    params: dict[str, Any] = {
        "tok_embd": q(cfg.n_vocab, e),
        "layers": [],
        "output_norm": jnp.ones(e, jnp.float32),
        "output": None if cfg.tie_embeddings else q(cfg.n_vocab, e),
    }
    for _ in range(cfg.n_layers):
        layer = {
            "attn_norm": jnp.ones(e, jnp.float32),
            "wq": q(h * hd, e), "wk": q(kvh * hd, e), "wv": q(kvh * hd, e),
            "wo": q(e, h * hd),
            "ffn_norm": jnp.ones(e, jnp.float32),
            "w_gate": q(f, e), "w_up": q(f, e), "w_down": q(e, f),
        }
        if cfg.qkv_bias:
            layer["bq"] = jax.random.normal(next(keys), (h * hd,), jnp.float32) * 0.02
            layer["bk"] = jax.random.normal(next(keys), (kvh * hd,), jnp.float32) * 0.02
            layer["bv"] = jax.random.normal(next(keys), (kvh * hd,), jnp.float32) * 0.02
        params["layers"].append(layer)
    return params


def synth_host_layer(cfg: ModelConfig, i: int, ggml_type: GGMLType = GGMLType.Q4_K,
                     seed: int = 0) -> dict:
    """Host (UQTensor / numpy) tensors for one synthetic layer — the input
    unit for both single-chip placement and pipeline/TP sharding."""
    rng = np.random.default_rng(seed * 1000003 + i)
    e, h, kvh, hd, f = cfg.n_embd, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.n_ff
    layer = {
        "attn_norm": np.ones(e, dtype=np.float32),
        "wq": _synth_uq(rng, h * hd, e, ggml_type),
        "wk": _synth_uq(rng, kvh * hd, e, ggml_type),
        "wv": _synth_uq(rng, kvh * hd, e, ggml_type),
        "wo": _synth_uq(rng, e, h * hd, ggml_type),
        "ffn_norm": np.ones(e, dtype=np.float32),
        "w_gate": _synth_uq(rng, f, e, ggml_type),
        "w_up": _synth_uq(rng, f, e, ggml_type),
        "w_down": _synth_uq(rng, e, f, ggml_type),
    }
    if cfg.qkv_bias:
        layer["bq"] = rng.standard_normal(h * hd).astype(np.float32) * 0.02
        layer["bk"] = rng.standard_normal(kvh * hd).astype(np.float32) * 0.02
        layer["bv"] = rng.standard_normal(kvh * hd).astype(np.float32) * 0.02
    return layer


def synth_host_head(cfg: ModelConfig, ggml_type: GGMLType = GGMLType.Q4_K, seed: int = 0) -> dict:
    """Host tensors for embedding / output-norm / lm-head (synthetic)."""
    rng = np.random.default_rng(seed)
    return {
        "tok_embd": _synth_uq(rng, cfg.n_vocab, cfg.n_embd, ggml_type),
        "output_norm": np.ones(cfg.n_embd, dtype=np.float32),
        "output": None if cfg.tie_embeddings else _synth_uq(rng, cfg.n_vocab, cfg.n_embd, ggml_type),
    }


def gguf_host_head(m: GGUFModel, cfg: ModelConfig) -> dict:
    from ..quant.dequant_np import dequantize_tensor

    def uq(name):
        ti = m.tensors.get(name)
        if ti is None:
            return None
        t = ti.ggml_type
        if TYPE_TRAITS[t].is_quantized and t in SUPPORTED_TYPES:
            return to_device_format(ti.data, t, ti.ne[0])
        return dequantize_tensor(ti).astype(np.float32)

    return {
        "tok_embd": uq("token_embd.weight"),
        "output_norm": dequantize_tensor(m.tensors["output_norm.weight"]).astype(np.float32),
        "output": None if cfg.tie_embeddings else uq("output.weight"),
    }


def gguf_host_layer(m: GGUFModel, cfg: ModelConfig, i: int) -> dict:
    """Host tensors for layer i of a GGUF model (UQTensor for quantized
    weights, numpy f32 for norms/biases)."""
    from ..quant.dequant_np import dequantize_tensor

    p = f"blk.{i}."

    def uq(name):
        ti = m.tensors[p + name]
        t = ti.ggml_type
        if TYPE_TRAITS[t].is_quantized and t in SUPPORTED_TYPES:
            return to_device_format(ti.data, t, ti.ne[0])
        return dequantize_tensor(ti).astype(np.float32)

    def vec(name, required=True):
        ti = m.tensors.get(p + name)
        if ti is None:
            if required:
                raise KeyError(f"missing tensor {p + name}")
            return None
        return dequantize_tensor(ti).astype(np.float32)

    layer = {
        "attn_norm": vec("attn_norm.weight"),
        "wq": uq("attn_q.weight"),
        "wk": uq("attn_k.weight"),
        "wv": uq("attn_v.weight"),
        "wo": uq("attn_output.weight"),
        "ffn_norm": vec("ffn_norm.weight"),
        "w_gate": uq("ffn_gate.weight"),
        "w_up": uq("ffn_up.weight"),
        "w_down": uq("ffn_down.weight"),
    }
    if cfg.qkv_bias:
        layer["bq"] = vec("attn_q.bias")
        layer["bk"] = vec("attn_k.bias")
        layer["bv"] = vec("attn_v.bias")
    return layer


def synth_params(
    cfg: ModelConfig,
    ggml_type: GGMLType = GGMLType.Q4_K,
    seed: int = 0,
    layer_filter: Callable[[int], bool] | None = None,
) -> dict:
    """Random-weight params with realistic quantized layout (benchmarks and
    tests; perf-identical to real weights of the same ftype)."""
    rng = np.random.default_rng(seed)

    def q(rows, k):
        uq = _synth_uq(rng, rows, k, ggml_type)
        return QTensor.from_host(uq)

    def vec(n):
        return jax.device_put(np.ones(n, dtype=np.float32))

    params: dict[str, Any] = {
        "tok_embd": q(cfg.n_vocab, cfg.n_embd),
        "layers": [],
        "output_norm": vec(cfg.n_embd),
        "output": None if cfg.tie_embeddings else q(cfg.n_vocab, cfg.n_embd),
    }
    for i in range(cfg.n_layers):
        if layer_filter is not None and not layer_filter(i):
            params["layers"].append(None)
            continue
        host = synth_host_layer(cfg, i, ggml_type, seed)
        layer = {
            name: QTensor.from_host(t) if isinstance(t, _UQ) else jax.device_put(t)
            for name, t in host.items()
        }
        params["layers"].append(layer)
    return params


def _synth_uq(rng, rows, k, t: GGMLType):
    """Directly synthesize a UQTensor (no GGUF round-trip) with ~N(0, 0.02)."""
    from ..quant.device_format import UQTensor

    if t == GGMLType.Q4_K:
        sub, layout, off = 32, "nib4", 0
        qs = rng.integers(0, 256, size=(rows, k // 2), dtype=np.uint16).astype(np.uint8)
    elif t == GGMLType.Q4_0:
        sub, layout, off = 32, "nib4", -8
        qs = rng.integers(0, 256, size=(rows, k // 2), dtype=np.uint16).astype(np.uint8)
    elif t in (GGMLType.Q8_0, GGMLType.Q6_K, GGMLType.Q5_K):
        sub = 32 if t != GGMLType.Q6_K else 16
        layout, off = "int8", 0
        lim = {GGMLType.Q8_0: 127, GGMLType.Q6_K: 31, GGMLType.Q5_K: 31}[t]
        qs = rng.integers(-lim, lim + 1, size=(rows, k), dtype=np.int16).astype(np.int8)
    else:
        raise NotImplementedError(f"synth for {t.name}")
    qmax = {GGMLType.Q4_K: 15, GGMLType.Q4_0: 8, GGMLType.Q8_0: 127, GGMLType.Q6_K: 31, GGMLType.Q5_K: 31}[t]
    s = k // sub
    gsub = {GGMLType.Q4_K: 8, GGMLType.Q5_K: 8, GGMLType.Q6_K: 16}.get(t, 1)
    if s % gsub:
        gsub = 1  # synthetic sub-superblock shapes: flat scales
    if gsub > 1:
        has_mins = t in (GGMLType.Q4_K, GGMLType.Q5_K)
        codes = rng.integers(1, 64, size=(rows, s), dtype=np.int16).astype(np.int8)
        mcodes = (rng.integers(0, 32, size=(rows, s), dtype=np.int16).astype(np.int8)
                  if has_mins else None)
        # bases rounded to f16 values (exactly representable in the packed
        # device layout, like real GGUF d/dmin)
        d = ((np.abs(rng.standard_normal((rows, s // gsub))) * (0.02 / qmax / 32)
              + 1e-6).astype(np.float16)).astype(np.float32)
        dmin = ((np.abs(rng.standard_normal((rows, s // gsub))) * (0.01 / qmax / 32)
                 ).astype(np.float16)).astype(np.float32) if has_mins else None
        return UQTensor(qs, codes, mcodes, sub, layout, off, t, (rows, k),
                        d=d, dmin=dmin, gsub=gsub)
    scales = (np.abs(rng.standard_normal((rows, s))) * 0.02 / qmax + 1e-4).astype(np.float32)
    mins = None
    if t in (GGMLType.Q4_K, GGMLType.Q5_K):
        mins = (scales * rng.uniform(0, qmax / 2, size=scales.shape)).astype(np.float32)
    return UQTensor(qs, scales, mins, sub, layout, off, t, (rows, k))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ForwardOptions:
    matmul_impl: str = "xla"
    attn_impl: str = "xla"  # "pallas" = flash attention (ops/attention_pallas)
    dtype: Any = jnp.bfloat16
    logits_dtype: Any = jnp.float32
    # Megatron-style tensor parallelism inside shard_map: wq/wk/wv/gate/up
    # are row-sharded (local heads / local FFN columns), wo/down are
    # column-sharded, and their partial outputs are psum'd over this axis.
    tp_axis: str | None = None
    # sequence parallelism inside shard_map: the KV cache's T axis is
    # sharded over this mesh axis; attention runs blockwise per shard and
    # combines with a log-sum-exp psum (ops/layers.gqa_attention_sp) —
    # the TPU long-context axis (SURVEY §5.7)
    sp_axis: str | None = None


def model_norm(x, w, b, cfg: ModelConfig) -> jax.Array:
    """Arch norm dispatch: RMSNorm or (possibly non-parametric) LayerNorm."""
    if cfg.norm_type == "rms":
        return rms_norm(x, w, cfg.rms_eps)
    from ..ops.layers import layer_norm

    return layer_norm(x, w, b, cfg.rms_eps)


def attention_block(
    layer: dict,
    cfg: ModelConfig,
    x: jax.Array,  # (b, s, e) normed input
    positions: jax.Array,  # (b, s)
    kv: tuple[jax.Array, jax.Array],  # (b, T, n_kv, hd) caches
    cache_pos: jax.Array,  # (b,) write index
    mask: jax.Array,  # (b, 1, s, T)
    inv_freq: jax.Array,
    mscale: float,
    opts: ForwardOptions,
    *,
    mask_pos: jax.Array | None = None,
    taps: dict | None = None,
    tap_prefix: str = "",
    heads: tuple[int, int] | None = None,  # openelm per-layer (h, kvh)
):
    b, s, _ = x.shape
    hd = cfg.head_dim
    h, kvh = heads if heads is not None else (cfg.n_heads, cfg.n_kv_heads)
    if taps is not None:  # imatrix activation statistics (examples/imatrix)
        _tap(taps, tap_prefix + "attn_q.weight", x)
        _tap(taps, tap_prefix + "attn_k.weight", x)
        _tap(taps, tap_prefix + "attn_v.weight", x)
    if layer.get("wqkv") is not None:
        # fused QKV projection: one kernel streams all three weights (fewer
        # launches; the small K/V GEMVs ride the big Q tile pipeline)
        qkv = linear(x, layer["wqkv"], opts.matmul_impl)
        nq, nk = h * hd, kvh * hd
        q = qkv[..., :nq]
        k = qkv[..., nq : nq + nk]
        v = qkv[..., nq + nk :]
    else:
        q = linear_l(layer, "wq", x, opts.matmul_impl)
        k = linear_l(layer, "wk", x, opts.matmul_impl)
        v = linear_l(layer, "wv", x, opts.matmul_impl)
    if layer.get("wq_scale") is not None:  # bitnet per-tensor scales
        q = q * layer["wq_scale"].astype(q.dtype)
    if layer.get("wk_scale") is not None:
        k = k * layer["wk_scale"].astype(k.dtype)
    if layer.get("wv_scale") is not None:
        v = v * layer["wv_scale"].astype(v.dtype)
    if layer.get("bq") is not None:
        q = q + layer["bq"].astype(q.dtype)
        k = k + layer["bk"].astype(k.dtype)
        v = v + layer["bv"].astype(v.dtype)
    if cfg.clamp_kqv:  # olmo (build_olmo ggml_clamp)
        c = np.float32(cfg.clamp_kqv)
        q, k, v = (jnp.clip(a, -c, c) for a in (q, k, v))
    if layer.get("attn_q_norm") is not None and not cfg.qk_norm_head:
        # olmoe: RMS over the full q/k vectors
        q = rms_norm(q, layer["attn_q_norm"], cfg.rms_eps)
        k = rms_norm(k, layer["attn_k_norm"], cfg.rms_eps)
    q = q.reshape(b, s, h, hd)
    k = k.reshape(b, s, kvh, hd)
    v = v.reshape(b, s, kvh, hd)
    if cfg.qk_norm_head and layer.get("attn_q_norm") is not None:
        # chameleon: per-head LayerNorm on q/k BEFORE rope
        # (build_chameleon, src/llama.cpp:16771-16791); openelm uses
        # per-head RMS norms instead (build_openelm @15095-15103)
        if cfg.qk_norm_rms:
            q = rms_norm(q, layer["attn_q_norm"], cfg.rms_eps)
            k = rms_norm(k, layer["attn_k_norm"], cfg.rms_eps)
        else:
            from ..ops.layers import layer_norm

            q = layer_norm(q, layer["attn_q_norm"], layer.get("attn_q_norm_b"),
                           cfg.rms_eps)
            k = layer_norm(k, layer["attn_k_norm"], layer.get("attn_k_norm_b"),
                           cfg.rms_eps)
    if cfg.rope_dim:  # gpt2/starcoder: learned positions, no rope
        q = apply_rope(q, positions, inv_freq, cfg.rope_type, mscale)
        k = apply_rope(k, positions, inv_freq, cfg.rope_type, mscale)

    from ..ops.kvquant import kv_seq_len, update_kv, update_kv_sp

    k_cache, v_cache = kv
    if opts.sp_axis is not None:
        # each shard owns global cells [offset, offset + T_loc)
        t_loc = kv_seq_len(k_cache)
        sp_offset = (jax.lax.axis_index(opts.sp_axis) * t_loc
                     ).astype(jnp.int32)
        k_cache = update_kv_sp(k_cache, k, cache_pos, sp_offset)
        v_cache = update_kv_sp(v_cache, v, cache_pos, sp_offset)
    else:
        k_cache = update_kv(k_cache, k, cache_pos)
        v_cache = update_kv(v_cache, v, cache_pos)

    scale = cfg.attn_scale or 1.0 / np.sqrt(hd)
    slopes = None
    if cfg.alibi_max_bias:  # bloom/mpt
        from ..ops.layers import alibi_slopes

        slopes = jnp.asarray(alibi_slopes(h, cfg.alibi_max_bias))
    if opts.sp_axis is not None:
        from ..ops.layers import gqa_attention_sp

        # shard-local causal mask: global column j is visible iff
        # j <= mpos, i.e. local column j' <= mpos - offset
        mp = positions if mask_pos is None else mask_pos
        mask_sp = causal_mask(mp - sp_offset, t_loc)
        if cfg.attn_logit_softcap or slopes is not None:
            raise NotImplementedError(
                "sequence parallelism with softcap/ALiBi attention")
        out = gqa_attention_sp(q, k_cache.astype(q.dtype),
                               v_cache.astype(q.dtype), mask_sp, scale,
                               opts.sp_axis)
    elif (opts.attn_impl == "pallas" and not cfg.attn_logit_softcap
            and not cfg.swa_window and slopes is None):
        from ..ops.attention_pallas import flash_attention

        # visibility follows the PHYSICAL cache order (mask_pos), which only
        # differs from the RoPE positions under Self-Extend
        out = flash_attention(q, k_cache.astype(q.dtype), v_cache.astype(q.dtype),
                              positions if mask_pos is None else mask_pos,
                              scale)
    else:
        out = gqa_attention(q, k_cache.astype(q.dtype), v_cache.astype(q.dtype),
                            mask, scale, cfg.attn_logit_softcap,
                            slopes=slopes)
    out = out.reshape(b, s, h * hd)
    if cfg.sub_norms and layer.get("attn_sub_norm") is not None:
        # bitnet: RMS sub-norm on the attention result BEFORE the output
        # projection (build_bitnet @15754-15757)
        out = rms_norm(out, layer["attn_sub_norm"], cfg.rms_eps)
    if taps is not None:
        _tap(taps, tap_prefix + "attn_output.weight", out)
    out = linear_l(layer, "wo", out, opts.matmul_impl)
    if layer.get("wo_scale") is not None:
        out = out * layer["wo_scale"].astype(out.dtype)
    if opts.tp_axis is not None:
        out = jax.lax.psum(out, opts.tp_axis)  # column-parallel wo
    if layer.get("bo") is not None:
        out = out + layer["bo"].astype(out.dtype)
    return out, (k_cache, v_cache)


def _tap(taps: dict, name: str, x: jax.Array) -> None:
    """Accumulate per-input-column sum(x^2) and token count for `name` —
    the statistics examples/imatrix/imatrix.cpp:171-196 collects per
    mul_mat input."""
    ssq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=tuple(range(x.ndim - 1)))
    cnt = jnp.asarray(np.prod(x.shape[:-1]), jnp.int64 if False else jnp.int32)
    prev = taps.get(name)
    if prev is not None:
        ssq = ssq + prev[0]
        cnt = cnt + prev[1]
    taps[name] = (ssq, cnt)


def ffn_block(layer: dict, x: jax.Array, opts: ForwardOptions,
              act_fn: str = "silu", *, gated: bool = True,
              taps: dict | None = None, tap_prefix: str = "",
              eps: float = 1e-5) -> jax.Array:
    if taps is not None:
        if gated:
            _tap(taps, tap_prefix + "ffn_gate.weight", x)
        _tap(taps, tap_prefix + "ffn_up.weight", x)
    if gated and layer.get("w_gateup") is not None:
        gu = linear(x, layer["w_gateup"], opts.matmul_impl)
        nf = gu.shape[-1] // 2
        act = gated_act(gu[..., :nf], gu[..., nf:], act_fn)
        out = linear_l(layer, "w_down", act, opts.matmul_impl)
        if opts.tp_axis is not None:
            out = jax.lax.psum(out, opts.tp_axis)
        if layer.get("b_down") is not None:
            out = out + layer["b_down"].astype(out.dtype)
        return out
    up = linear_l(layer, "w_up", x, opts.matmul_impl)
    if layer.get("w_up_scale") is not None:  # bitnet
        up = up * layer["w_up_scale"].astype(up.dtype)
    if layer.get("b_up") is not None:
        up = up + layer["b_up"].astype(up.dtype)
    if gated:
        gate = linear_l(layer, "w_gate", x, opts.matmul_impl)
        if layer.get("w_gate_scale") is not None:  # bitnet
            gate = gate * layer["w_gate_scale"].astype(gate.dtype)
        if layer.get("b_gate") is not None:  # jais: biased gate projection
            gate = gate + layer["b_gate"].astype(gate.dtype)
        act = gated_act(gate, up, act_fn)
    elif act_fn == "swiglu_split":
        # chatglm LLM_FFN_SWIGLU: ffn_up holds [gate | up] halves
        nf = up.shape[-1] // 2
        act = gated_act(up[..., :nf], up[..., nf:], "silu")
    else:  # plain MLP (starcoder2): act(up) with ggml's tanh-approx GELU
        act = gated_act(up, jnp.ones((), up.dtype), act_fn)
    if layer.get("ffn_sub_norm") is not None:
        # bitnet: RMS sub-norm on the activation BEFORE ffn_down
        # (build_bitnet @15793-15798)
        act = rms_norm(act, layer["ffn_sub_norm"], eps)
    if taps is not None:
        _tap(taps, tap_prefix + "ffn_down.weight", act)
    out = linear_l(layer, "w_down", act, opts.matmul_impl)
    if layer.get("w_down_scale") is not None:  # bitnet
        out = out * layer["w_down_scale"].astype(out.dtype)
    if opts.tp_axis is not None:
        out = jax.lax.psum(out, opts.tp_axis)  # column-parallel w_down
    if layer.get("b_down") is not None:
        # replicated bias added ONCE, after the tp reduction (like bo)
        out = out + layer["b_down"].astype(out.dtype)
    return out


def moe_ffn(layer: dict, cfg: ModelConfig, x: jax.Array,
            opts: ForwardOptions) -> jax.Array:
    """Mixture-of-experts FFN (Mixtral: llm_build_moe_ffn with normalized
    top-k weights, src/llama.cpp llama arch with n_expert > 0).

    Decode (one token): the top-k experts' weights are gathered with dynamic
    indices — only the selected experts' bytes stream from HBM. Prefill:
    dense loop over experts with zero weights for unselected ones."""
    b, s, e = x.shape
    k_used = cfg.n_expert_used
    logits = linear(x, layer["ffn_gate_inp"], opts.matmul_impl).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # (b, s, n_expert)
    w, ids = jax.lax.top_k(probs, k_used)
    if cfg.moe_norm_w:  # Mixtral yes; qwen2moe keeps raw softmax weights
        w = w / jnp.sum(w, axis=-1, keepdims=True)

    def expert(params_e, xx):
        gate = linear(xx, params_e[0], opts.matmul_impl)
        up = linear(xx, params_e[1], opts.matmul_impl)
        return linear(gated_act(gate, up, cfg.act), params_e[2], opts.matmul_impl)

    stacked = (layer["ffn_gate_exps"], layer["ffn_up_exps"], layer["ffn_down_exps"])
    if b * s == 1:
        out = jnp.zeros((b, s, e), x.dtype)
        idv = ids.reshape(-1)
        wv = w.reshape(-1)
        for j in range(k_used):
            params_e = tuple(t[idv[j]] for t in stacked)  # dynamic-slice
            out = out + wv[j].astype(x.dtype) * expert(params_e, x)
    else:
        weight_per_expert = jnp.sum(
            jnp.where(ids[..., None, :] == jnp.arange(cfg.n_expert)[None, None, :, None],
                      w[..., None, :], 0.0), axis=-1)  # (b, s, n_expert)
        out = jnp.zeros((b, s, e), x.dtype)
        for eidx in range(cfg.n_expert):
            params_e = tuple(t[eidx] for t in stacked)
            out = out + weight_per_expert[..., eidx:eidx + 1].astype(x.dtype) * expert(params_e, x)
    if layer.get("ffn_gate_inp_shexp") is not None:
        # qwen2moe shared expert: a dense FFN gated by a per-token sigmoid
        # (build_qwen2moe, src/llama.cpp:12943-12966)
        g = jax.nn.sigmoid(
            linear(x, layer["ffn_gate_inp_shexp"], opts.matmul_impl)
            .astype(jnp.float32))
        sh_gate = linear(x, layer["ffn_gate_shexp"], opts.matmul_impl)
        sh_up = linear(x, layer["ffn_up_shexp"], opts.matmul_impl)
        sh = linear(gated_act(sh_gate, sh_up, cfg.act),
                    layer["ffn_down_shexp"], opts.matmul_impl)
        out = out + sh * g.astype(x.dtype)
    if opts.tp_axis is not None:
        out = jax.lax.psum(out, opts.tp_axis)
    return out


def decode_layer(
    layer: dict,
    cfg: ModelConfig,
    x: jax.Array,
    positions: jax.Array,
    kv,
    cache_pos,
    mask,
    inv_freq,
    mscale,
    opts: ForwardOptions,
    *,
    mask_pos: jax.Array | None = None,
    taps: dict | None = None,
    tap_prefix: str = "",
    heads: tuple[int, int] | None = None,  # openelm per-layer (h, kvh)
):
    # chameleon swin_norm variant: the norm moves to the branch OUTPUT
    # (build_chameleon hparams.swin_norm, src/llama.cpp:16752-16756)
    attn_in = x if cfg.swin_norm else model_norm(
        x, layer.get("attn_norm"), layer.get("attn_norm_b"), cfg)
    attn_out, kv = attention_block(
        layer, cfg, attn_in, positions, kv, cache_pos, mask, inv_freq, mscale, opts,
        mask_pos=mask_pos, taps=taps, tap_prefix=tap_prefix, heads=heads,
    )
    if cfg.parallel_block:
        # command-r/phi2: ffn shares the attention norm input; gptneox-style
        # parallel residual instead norms the ORIGINAL input with ffn_norm
        ffn_in = attn_in
        if layer.get("ffn_norm") is not None:
            ffn_in = model_norm(x, layer["ffn_norm"],
                                layer.get("ffn_norm_b"), cfg)
        ffn_out = ffn_block(layer, ffn_in, opts, cfg.act,
                            gated=cfg.ffn_gated, taps=taps,
                            tap_prefix=tap_prefix, eps=cfg.rms_eps)
        x = x + attn_out + ffn_out
        if layer.get("cvec") is not None:
            x = x + layer["cvec"].astype(x.dtype)
        return x, kv
    if cfg.post_norms and layer.get("attn_post_norm") is not None:
        # gemma2/grok: norm the branch output before the residual
        attn_out = rms_norm(attn_out, layer["attn_post_norm"], cfg.rms_eps)
    if cfg.swin_norm:  # chameleon: post-norm with the SAME attn_norm weights
        attn_out = model_norm(attn_out, layer.get("attn_norm"),
                              layer.get("attn_norm_b"), cfg)
    if cfg.residual_scale != 1.0:  # minicpm scale_depth/sqrt(n_layer)
        attn_out = attn_out * np.float32(cfg.residual_scale)
    if cfg.moe_parallel_dense and layer.get("ffn_gate_inp") is not None:
        # arctic (build_arctic @15316): dense FFN off the post-attn
        # residual, MoE off the LAYER INPUT (ffn_norm_exps), summed
        x_in = x
        ffn_inp = x + attn_out
        dense = ffn_block(layer, rms_norm(ffn_inp, layer["ffn_norm"],
                                          cfg.rms_eps),
                          opts, cfg.act, gated=True, taps=taps,
                          tap_prefix=tap_prefix, eps=cfg.rms_eps)
        moe = moe_ffn(layer, cfg,
                      rms_norm(x_in, layer["ffn_norm_exps"], cfg.rms_eps),
                      opts)
        x = moe + dense + ffn_inp
        if layer.get("cvec") is not None:
            x = x + layer["cvec"].astype(x.dtype)
        return x, kv
    x = x + attn_out
    ffn_in = x if cfg.swin_norm else model_norm(
        x, layer.get("ffn_norm"), layer.get("ffn_norm_b"), cfg)
    if cfg.n_expert and layer.get("ffn_gate_inp") is not None:
        ffn_out = moe_ffn(layer, cfg, ffn_in, opts)
    else:
        ffn_out = ffn_block(layer, ffn_in, opts, cfg.act,
                            gated=cfg.ffn_gated, taps=taps,
                            tap_prefix=tap_prefix, eps=cfg.rms_eps)
    if cfg.post_norms and layer.get("ffn_post_norm") is not None:
        ffn_out = rms_norm(ffn_out, layer["ffn_post_norm"], cfg.rms_eps)
    if cfg.swin_norm:
        ffn_out = model_norm(ffn_out, layer.get("ffn_norm"),
                             layer.get("ffn_norm_b"), cfg)
    if cfg.residual_scale != 1.0:
        ffn_out = ffn_out * np.float32(cfg.residual_scale)
    x = x + ffn_out
    if layer.get("cvec") is not None:  # control vector (llama_control_vector_apply)
        x = x + layer["cvec"].astype(x.dtype)
    return x, kv


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jax.Array,  # (b, s) int32
    positions: jax.Array,  # (b, s) int32
    kv_caches: list,  # per layer (k, v): (b, T, n_kv, hd)
    cache_pos: jax.Array,  # (b,)
    opts: ForwardOptions = ForwardOptions(),
    layer_range: tuple[int, int] | None = None,
    hidden_in: jax.Array | None = None,
    return_hidden: bool = False,
    taps: dict | None = None,
    mask_positions: jax.Array | None = None,
    attn_mask: jax.Array | None = None,
    inputs_embeds: jax.Array | None = None,
):
    """Full or partial (layer-window) forward.

    inputs_embeds (b, s, e) replaces the token-embedding lookup — the
    multimodal path where image patch embeddings are spliced into the
    sequence (llava_eval_image_embed, examples/llava/llava.cpp:409-436).

    With layer_range=(lo, hi), runs layers [lo, hi) taking hidden_in instead
    of embeddings when lo > 0 and returning hidden states when hi < n_layers
    — the building block for pipeline windows.
    """
    lo, hi = layer_range or (0, cfg.n_layers)
    if lo == 0 and inputs_embeds is not None:
        x = inputs_embeds.astype(opts.dtype)
    elif lo == 0:
        x = embed(params["tok_embd"], tokens, opts.dtype)
        if cfg.embd_scale != 1.0:  # gemma: sqrt(n_embd) input scaling
            x = x * np.float32(cfg.embd_scale)
        if params.get("pos_embd") is not None:  # gpt2/starcoder learned pos
            x = x + params["pos_embd"][positions].astype(x.dtype)
        if params.get("tok_embd_norm") is not None:  # bloom embedding LN
            from ..ops.layers import layer_norm

            x = layer_norm(x, params["tok_embd_norm"],
                           params.get("tok_embd_norm_b"), cfg.rms_eps)
    else:
        assert hidden_in is not None
        x = hidden_in

    inv_freq, mscale = rope_freqs(cfg)
    t_cache = kv_caches[lo][0].shape[1] if kv_caches else 0
    # Self-Extend compresses the LOGICAL (RoPE) positions below the physical
    # write index; causal visibility must follow the physical cache order
    # (main.cpp:618-640), so the mask may use separate positions.
    mpos = positions if mask_positions is None else mask_positions
    if attn_mask is not None:
        # caller-supplied additive mask (b,1,s,t) — non-causal visibility,
        # e.g. the lookahead decoder's Jacobi/verification tree. Flash
        # attention derives visibility from positions alone, so force the
        # masked attention path.
        mask = attn_mask
        if opts.attn_impl == "pallas":
            import dataclasses as _dc

            opts = _dc.replace(opts, attn_impl="xla")
    elif cfg.alibi_max_bias:  # bloom/mpt: mask carries -|pos_i - j| distances
        mask = alibi_mask(mpos, t_cache)
    else:
        mask = causal_mask(mpos, t_cache)
    # gemma2: sliding-window attention on even layers (build_gemma2:14357)
    mask_swa = (causal_mask(mpos, t_cache, swa_window=cfg.swa_window)
                if cfg.swa_window else None)

    new_kv = list(kv_caches)
    for i in range(lo, hi):
        layer = params["layers"][i]
        assert layer is not None, f"layer {i} not loaded on this rank"
        m = mask_swa if (mask_swa is not None and i % 2 == 0) else mask
        heads = ((cfg.n_heads_arr[i], cfg.n_kv_heads_arr[i])
                 if cfg.n_heads_arr else None)
        x, new_kv[i] = decode_layer(
            layer, cfg, x, positions, new_kv[i], cache_pos, m, inv_freq,
            mscale, opts, mask_pos=mask_positions, taps=taps,
            tap_prefix=f"blk.{i}.", heads=heads,
        )

    if hi < cfg.n_layers or return_hidden:
        return x, new_kv

    x = model_norm(x, params.get("output_norm"), params.get("output_norm_b"),
                   cfg)
    if cfg.logit_scale != 1.0:  # minicpm/command-r: scaled before lm_head
        x = x * np.float32(cfg.logit_scale)
    w_out = params["output"] if params.get("output") is not None else params["tok_embd"]
    if taps is not None:
        _tap(taps, "output.weight", x)
    logits = linear(x, w_out, opts.matmul_impl).astype(opts.logits_dtype)
    if params.get("output_b") is not None:  # phi2 biased lm_head
        logits = logits + params["output_b"].astype(logits.dtype)
    if cfg.final_logit_softcap:  # gemma2 (build_gemma2:14427)
        cap = np.float32(cfg.final_logit_softcap)
        logits = cap * jnp.tanh(logits / cap)
    return logits, new_kv


def init_kv_caches(
    cfg: ModelConfig,
    batch: int,
    max_seq: int,
    dtype=jnp.bfloat16,
    layer_filter: Callable[[int], bool] | None = None,
) -> list:
    """Per-layer KV buffers; unowned layers get None (the analogue of
    rank-filtered llama_kv_cache_init, src/llama.cpp:3920-3975)."""
    caches = []
    for i in range(cfg.n_layers):
        if layer_filter is not None and not layer_filter(i):
            caches.append(None)
            continue
        kvh = cfg.n_kv_heads_arr[i] if cfg.n_kv_heads_arr else cfg.n_kv_heads
        shape = (batch, max_seq, kvh, cfg.head_dim)
        if isinstance(dtype, str) and dtype == "q4_0":
            from ..ops.kvquant import KVQ4

            caches.append((KVQ4.zeros(shape), KVQ4.zeros(shape)))
            continue
        if isinstance(dtype, str) and dtype == "q8_0":
            from ..ops.kvquant import KVQ8

            caches.append((KVQ8.zeros(shape), KVQ8.zeros(shape)))
        else:
            caches.append((jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)))
    return caches
