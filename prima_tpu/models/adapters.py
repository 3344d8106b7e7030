"""LoRA adapters and control vectors.

LoRA (the llama_lora_adapter analogue, reference src/llama.cpp lora loading
+ llm_build_lora_mm): adapters stay separate from the base weights — the
forward computes y = W x + scale * B (A x), so quantized base tensors are
never dequantized/requantized and multiple adapters stack.

GGUF layout (convert_lora_to_gguf.py): tensors `<base name>.lora_a` (r, K)
and `<base name>.lora_b` (N, r); `adapter.lora.alpha` KV; scale =
user_scale * alpha / r.

Control vectors (llama_control_vector_apply): per-layer direction vectors
`direction.<layer>` added to the hidden state after each layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..quant.dequant_np import dequantize_tensor

# gguf tensor suffix -> our layer param name
_NAME_MAP = {
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "ffn_gate.weight": "w_gate",
    "ffn_up.weight": "w_up",
    "ffn_down.weight": "w_down",
}


def load_lora_gguf(path: str, scale: float = 1.0, dtype=jnp.bfloat16) -> dict:
    """Returns {layer_idx: {param_name: (A, B, scale)}} plus 'head' entries.

    A: (r, K), B: (N, r); y += scale * (x @ A^T) @ B^T.
    """
    m = GGUFModel.open(path)
    alpha = float(m.get("adapter.lora.alpha", 0.0))
    out: dict = {}
    pairs: dict[str, dict] = {}
    for name, ti in m.tensors.items():
        if name.endswith(".lora_a"):
            pairs.setdefault(name[: -len(".lora_a")], {})["a"] = ti
        elif name.endswith(".lora_b"):
            pairs.setdefault(name[: -len(".lora_b")], {})["b"] = ti
    for base, ab in pairs.items():
        if "a" not in ab or "b" not in ab:
            raise ValueError(f"lora adapter missing pair for {base}")
        a = jnp.asarray(dequantize_tensor(ab["a"]).astype(np.float32), dtype=dtype)
        b = jnp.asarray(dequantize_tensor(ab["b"]).astype(np.float32), dtype=dtype)
        r = a.shape[0]
        s = scale * (alpha / r if alpha > 0 else 1.0)
        if base.startswith("blk."):
            _, idx, rest = base.split(".", 2)
            pname = _NAME_MAP.get(rest)
            if pname is None:
                continue
            out.setdefault(int(idx), {})[pname] = (a, b, s)
        elif base in ("token_embd", "output"):
            out.setdefault("head", {})[base] = (a, b, s)
    m.close()
    return out


def apply_lora(params: dict, lora: dict, scale: float = 1.0,
               pad_layers: bool = False) -> dict:
    """Attach adapter tensors to the params pytree (non-destructive: the
    adapter rides alongside the quantized base weights). Re-applying with
    another adapter STACKS (each param carries a list of (A, B, s) triples,
    the llama_lora_adapter_set semantics); `scale` multiplies the adapter's
    baked-in alpha/r scale (server /lora-adapters hot rescaling).

    pad_layers: give layers this adapter does NOT touch a zero-scale triple
    of the same shapes, keeping every layer's pytree structure identical so
    the list still stacks for the engine's lax.scan mode."""
    params = dict(params)
    layers = list(params["layers"])
    touched: dict[str, tuple] = {}  # pname -> example (a, b) for padding
    for idx, mods in lora.items():
        if idx == "head":
            continue
        if layers[idx] is None:
            continue  # layer not owned by this rank
        layer = dict(layers[idx])
        for pname, (a, b, s) in mods.items():
            prev = layer.get(pname + "_lora")
            stack = list(prev) if isinstance(prev, list) else (
                [prev] if prev is not None else [])
            stack.append((a, b, s * scale))
            layer[pname + "_lora"] = stack
            touched[pname] = (a, b)
        layers[idx] = layer
    if pad_layers:
        covered = {i for i in lora if i != "head"}
        for i, layer in enumerate(layers):
            if layer is None:
                continue
            for pname, (a, b) in touched.items():
                if i in covered and pname in lora[i]:
                    continue
                layer = dict(layer)
                prev = layer.get(pname + "_lora")
                stack = list(prev) if isinstance(prev, list) else (
                    [prev] if prev is not None else [])
                stack.append((jnp.zeros_like(a), jnp.zeros_like(b), 0.0))
                layer[pname + "_lora"] = stack
                layers[i] = layer
    params["layers"] = layers
    return params


def lora_delta(x: jax.Array, ab: tuple) -> jax.Array:
    """scale * (x @ A^T) @ B^T — two thin matmuls, XLA-fused."""
    a, b, s = ab
    h = jax.lax.dot_general(x, a, (((x.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = jax.lax.dot_general(h, b, (((h.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y * s).astype(x.dtype)


def load_control_vector(path: str, strength: float = 1.0,
                        dtype=jnp.float32) -> dict[int, jax.Array]:
    """{layer_idx: (n_embd,) direction} from a control-vector GGUF."""
    m = GGUFModel.open(path)
    out: dict[int, jax.Array] = {}
    for name, ti in m.tensors.items():
        if name.startswith("direction."):
            li = int(name.split(".")[1])
            out[li] = jnp.asarray(
                dequantize_tensor(ti).astype(np.float32) * strength, dtype=dtype
            )
    m.close()
    return out


def apply_control_vector(params: dict, cvec: dict[int, jax.Array],
                         layer_start: int = 0, layer_end: int = 10**9) -> dict:
    params = dict(params)
    layers = list(params["layers"])
    for li, vec in cvec.items():
        # control-vector ggufs are 1-indexed (llama.cpp applies direction.i
        # to the output of layer i-1)
        idx = li - 1
        if 0 <= idx < len(layers) and layers[idx] is not None \
                and layer_start <= idx < layer_end:
            layer = dict(layers[idx])
            layer["cvec"] = vec
            layers[idx] = layer
    params["layers"] = layers
    return params
