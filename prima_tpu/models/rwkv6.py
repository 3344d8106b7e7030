"""RWKV-v6 ("Finch") — recurrent linear-attention family.

The LLM_ARCH_RWKV6 analogue (build_rwkv6 src/llama.cpp:16617,
llm_build_rwkv6_time_mix @10371, llm_build_rwkv6_channel_mix @10514, and
the fused WKV recurrence ggml_compute_forward_rwkv_wkv_f32
ggml/src/ggml.c:16595). Per layer:

  time-mix   token-shift lerp with data-dependent 5-way LoRA mixes
             (w1/w2), per-token decay w = exp(-exp(lora(xw)+decay)),
             per-head WKV state recurrence
               out_t = r_t @ (u * (k_t v_t^T) + S);  S = diag(w_t) S + k_t v_t^T
             then per-head LayerNorm (group norm, eps 64e-5), affine
             time_mix_ln, silu-gate, output projection.
  channel-mix token-shift lerp; out = sigmoid(r) * (relu(k)^2 @ Wv^T).

TPU mapping: every projection is batched over the whole sequence (MXU);
only the (H, N, N) state update runs under lax.scan — elementwise outer
products, no matmuls, so the scan body is cheap and fully fused by XLA.
The hidden state replaces the KV cache: decode carries
(att_shift, ffn_shift, wkv) per layer and never recomputes the prefix.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..quant.dequant_np import dequantize_tensor


@dataclass
class Rwkv6Config:
    arch: str
    n_layers: int
    n_embd: int
    head_size: int
    n_ff: int
    n_vocab: int
    ln_eps: float
    rescale_every: int
    time_mix_extra_dim: int
    time_decay_extra_dim: int

    @property
    def n_heads(self) -> int:
        return self.n_embd // self.head_size

    @classmethod
    def from_gguf(cls, m: GGUFModel) -> "Rwkv6Config":
        assert m.arch == "rwkv6", m.arch
        g = m.arch_key
        tokens = m.get("tokenizer.ggml.tokens")
        return cls(
            arch=m.arch,
            n_layers=int(g("{arch}.block_count")),
            n_embd=int(g("{arch}.embedding_length")),
            head_size=int(g("{arch}.wkv.head_size")),
            n_ff=int(g("{arch}.feed_forward_length")),
            n_vocab=int(g("{arch}.vocab_size",
                          len(tokens) if tokens is not None else 0)),
            ln_eps=float(g("{arch}.attention.layer_norm_epsilon", 1e-5)),
            rescale_every=int(g("{arch}.rescale_every_n_layers", 0) or 0),
            time_mix_extra_dim=int(g("{arch}.time_mix_extra_dim", 32)),
            time_decay_extra_dim=int(g("{arch}.time_decay_extra_dim", 64)),
        )


def load_rwkv6_params(m: GGUFModel, cfg: Rwkv6Config,
                      dtype=jnp.float32) -> dict:
    """Tensor table mirrors the reference loader (LLM_ARCH_RWKV6 case).
    lerp tensors are stored ne={n_embd,1,1} — flattened to (e,) here."""

    def get(name, flat=False):
        ti = m.tensors.get(name)
        if ti is None:
            raise KeyError(f"missing tensor {name}")
        x = dequantize_tensor(ti)
        if flat:
            x = x.reshape(-1)
        return jnp.asarray(x, dtype=dtype)

    params: dict = {
        "tok_embd": get("token_embd.weight"),
        "tok_norm": get("token_embd_norm.weight", flat=True),
        "tok_norm_b": get("token_embd_norm.bias", flat=True),
        "output_norm": get("output_norm.weight", flat=True),
        "output_norm_b": get("output_norm.bias", flat=True),
        "output": get("output.weight"),
        "layers": [],
    }
    H, N = cfg.n_heads, cfg.head_size
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layer = {
            "attn_norm": get(p + "attn_norm.weight", flat=True),
            "attn_norm_b": get(p + "attn_norm.bias", flat=True),
            "attn_norm_2": get(p + "attn_norm_2.weight", flat=True),
            "attn_norm_2_b": get(p + "attn_norm_2.bias", flat=True),
            "w1": get(p + "time_mix_w1.weight"),  # (5*tmx, e)
            "w2": get(p + "time_mix_w2.weight"),  # (5, e, tmx)
            "first": get(p + "time_mix_first.weight").reshape(H, N),
            "decay": get(p + "time_mix_decay.weight", flat=True),
            "decay_w1": get(p + "time_mix_decay_w1.weight"),  # (tdx, e)
            "decay_w2": get(p + "time_mix_decay_w2.weight"),  # (e, tdx)
            "key": get(p + "time_mix_key.weight"),
            "value": get(p + "time_mix_value.weight"),
            "receptance": get(p + "time_mix_receptance.weight"),
            "gate": get(p + "time_mix_gate.weight"),
            "ln": get(p + "time_mix_ln.weight", flat=True),
            "ln_b": get(p + "time_mix_ln.bias", flat=True),
            "out": get(p + "time_mix_output.weight"),
            "cm_key": get(p + "channel_mix_key.weight"),
            "cm_value": get(p + "channel_mix_value.weight"),
            "cm_receptance": get(p + "channel_mix_receptance.weight"),
        }
        for nm, key in (("time_mix_lerp_x", "lerp_x"),
                        ("time_mix_lerp_w", "lerp_w"),
                        ("time_mix_lerp_k", "lerp_k"),
                        ("time_mix_lerp_v", "lerp_v"),
                        ("time_mix_lerp_r", "lerp_r"),
                        ("time_mix_lerp_g", "lerp_g"),
                        ("channel_mix_lerp_k", "cm_lerp_k"),
                        ("channel_mix_lerp_r", "cm_lerp_r")):
            layer[key] = get(p + nm + ".weight", flat=True)
        params["layers"].append(layer)
    return params


def init_rwkv6_state(cfg: Rwkv6Config, batch: int, dtype=jnp.float32) -> list:
    """Per-layer recurrent state (the architecture's 'KV cache'):
    att/ffn token-shift vectors + the (H, N, N) WKV state — the analogue
    of the reference's kv_self k_l (token shift) / v_l (wkv) reuse
    (build_rwkv6 @16641-16647)."""
    H, N = cfg.n_heads, cfg.head_size
    return [
        {
            "att_shift": jnp.zeros((batch, cfg.n_embd), dtype),
            "ffn_shift": jnp.zeros((batch, cfg.n_embd), dtype),
            "wkv": jnp.zeros((batch, H, N, N), dtype),
        }
        for _ in range(cfg.n_layers)
    ]


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _wkv_scan(r, k, v, w, u, state):
    """The WKV recurrence (ggml_compute_forward_rwkv_wkv_f32 semantics).

    r/k/v/w: (b, T, H, N); u: (H, N); state: (b, H, N, N) indexed
    [h, i(k-dim), j(v-dim)]. Returns out (b, T, H, N) and final state.
    """

    def step(s, inp):
        r_t, k_t, v_t, w_t = inp  # each (b, H, N)
        kv = k_t[..., :, None] * v_t[..., None, :]  # (b, H, N, N)
        out = jnp.einsum("bhi,bhij->bhj", r_t,
                         u[None, :, :, None] * kv + s)
        s = s * w_t[..., :, None] + kv
        return s, out

    # scan over time: move T to the leading axis
    rs, ks, vs, ws = (jnp.moveaxis(t, 1, 0) for t in (r, k, v, w))
    state, outs = jax.lax.scan(step, state, (rs, ks, vs, ws))
    return jnp.moveaxis(outs, 0, 1), state


def _time_mix(layer, cfg: Rwkv6Config, x, x_prev, wkv_state):
    """llm_build_rwkv6_time_mix (src/llama.cpp:10371-10512)."""
    b, T, e = x.shape
    H, N = cfg.n_heads, cfg.head_size
    sx = x_prev - x
    xxx = x + sx * layer["lerp_x"]
    z = jnp.tanh(xxx @ layer["w1"].T)  # (b, T, 5*tmx)
    z = z.reshape(b, T, 5, -1)
    mixes = jnp.einsum("btgx,gex->btge", z, layer["w2"])  # (b, T, 5, e)
    mw, mk, mv, mr, mg = (mixes[:, :, i] for i in range(5))
    xw = x + sx * (mw + layer["lerp_w"])
    xk = x + sx * (mk + layer["lerp_k"])
    xv = x + sx * (mv + layer["lerp_v"])
    xr = x + sx * (mr + layer["lerp_r"])
    xg = x + sx * (mg + layer["lerp_g"])

    r = (xr @ layer["receptance"].T).reshape(b, T, H, N)
    k = (xk @ layer["key"].T).reshape(b, T, H, N)
    v = (xv @ layer["value"].T).reshape(b, T, H, N)
    g = jax.nn.silu(xg @ layer["gate"].T)  # (b, T, e)

    wraw = jnp.tanh(xw @ layer["decay_w1"].T) @ layer["decay_w2"].T
    wraw = wraw + layer["decay"]
    w = jnp.exp(-jnp.exp(wraw)).reshape(b, T, H, N)

    out, wkv_state = _wkv_scan(r, k, v, w, layer["first"], wkv_state)
    # per-head group norm, eps 64e-5 (@10500-10506), then affine over e
    of = out.astype(jnp.float32)
    mu = jnp.mean(of, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(of - mu), axis=-1, keepdims=True)
    out = ((of - mu) * jax.lax.rsqrt(var + np.float32(64e-5))).reshape(b, T, e)
    out = out * layer["ln"] + layer["ln_b"]
    out = out.astype(x.dtype) * g
    return out @ layer["out"].T, wkv_state


def _channel_mix(layer, x, x_prev):
    """llm_build_rwkv6_channel_mix (src/llama.cpp:10514-10534)."""
    sx = x_prev - x
    xk = x + sx * layer["cm_lerp_k"]
    xr = x + sx * layer["cm_lerp_r"]
    r = jax.nn.sigmoid(xr @ layer["cm_receptance"].T)
    k = jnp.square(jax.nn.relu(xk @ layer["cm_key"].T))
    return r * (k @ layer["cm_value"].T)


def rwkv6_forward(params: dict, cfg: Rwkv6Config, tokens: jax.Array,
                  state: list | None = None):
    """tokens (b, s) -> (logits (b, s, vocab), new_state).

    The sequence dimension is processed in parallel except the WKV scan;
    token-shift x_prev is the one-step-delayed normed stream seeded from
    the carried shift state (build_rwkv6 @16652-16661)."""
    b, s = tokens.shape
    if state is None:
        state = init_rwkv6_state(cfg, b)
    new_state = []
    x = params["tok_embd"][tokens]
    x = _ln(x, params["tok_norm"], params["tok_norm_b"], cfg.ln_eps)
    for i, layer in enumerate(params["layers"]):
        st = state[i]
        xa = _ln(x, layer["attn_norm"], layer["attn_norm_b"], cfg.ln_eps)
        x_prev = jnp.concatenate([st["att_shift"][:, None], xa[:, :-1]], 1)
        tm, wkv = _time_mix(layer, cfg, xa, x_prev, st["wkv"])
        x = x + tm
        xf = _ln(x, layer["attn_norm_2"], layer["attn_norm_2_b"], cfg.ln_eps)
        x_prev = jnp.concatenate([st["ffn_shift"][:, None], xf[:, :-1]], 1)
        x = x + _channel_mix(layer, xf, x_prev)
        new_state.append({"att_shift": xa[:, -1], "ffn_shift": xf[:, -1],
                          "wkv": wkv})
        if cfg.rescale_every and (i + 1) % cfg.rescale_every == 0:
            x = x * np.float32(0.5)  # build_rwkv6 @16703-16705
    x = _ln(x, params["output_norm"], params["output_norm_b"], cfg.ln_eps)
    logits = x @ params["output"].T
    return logits, new_state


class Rwkv6Runtime:
    """Stateful greedy decode: the recurrent state IS the context — one
    forward per generated token, no prefix recompute."""

    def __init__(self, cfg: Rwkv6Config, params: dict, tokenizer=None,
                 eog_ids=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.eog_ids = eog_ids or set()
        self._fwd = jax.jit(
            lambda p, t, s: rwkv6_forward(p, cfg, t, s))

    @classmethod
    def load(cls, path: str, dtype=jnp.float32) -> "Rwkv6Runtime":
        m = GGUFModel.open(path)
        cfg = Rwkv6Config.from_gguf(m)
        params = load_rwkv6_params(m, cfg, dtype)
        from ..tokenizer import Tokenizer

        try:
            tok = Tokenizer.from_gguf(m)
        except Exception:
            tok = None
        eog = set()
        eos = m.get("tokenizer.ggml.eos_token_id")
        if eos is not None:
            eog.add(int(eos))
        m.close()
        return cls(cfg, params, tok, eog)

    def generate(self, prompt_tokens: list[int], n_predict: int = 32) -> list[int]:
        state = init_rwkv6_state(self.cfg, 1)
        logits, state = self._fwd(
            self.params,
            jnp.asarray(np.asarray(prompt_tokens, np.int32)[None]), state)
        out: list[int] = []
        tok = int(jnp.argmax(logits[0, -1]))
        for _ in range(n_predict):
            out.append(tok)
            if tok in self.eog_ids:
                break
            logits, state = self._fwd(
                self.params, jnp.asarray([[tok]], jnp.int32), state)
            tok = int(jnp.argmax(logits[0, -1]))
        return out
