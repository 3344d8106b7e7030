"""T5 encoder-decoder models.

The LLM_ARCH_T5 analogue (reference llm_build_t5* / llm_build_inp_embd_enc,
src/llama.cpp): T5 LayerNorm = RMSNorm without bias, unscaled attention
scores with learned relative-position-bucket biases (bidirectional in the
encoder, causal in the decoder; cross-attention unbiased), ReLU or
gated-GELU FFN, shared embeddings with the d_model^-0.5 logit scale when
tied.

GGUF schema: `t5.*` KVs plus `enc.blk.N.*` / `dec.blk.N.*` tensors
(attn_rel_b on block 0 only). Decoding here recomputes the decoder prefix
each step (correctness-oriented seq2seq support; the decoder-only families
own the optimized incremental path).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..ops.layers import rms_norm
from ..quant.dequant_np import dequantize_tensor


@dataclass
class T5Config:
    arch: str
    n_layers: int  # decoder layers
    n_enc_layers: int
    n_embd: int
    n_heads: int
    head_dim: int
    n_ff: int
    n_vocab: int
    rms_eps: float
    rel_buckets: int
    rel_max_dist: int
    dec_start_token: int
    tie_embeddings: bool
    ffn_gated: bool

    @classmethod
    def from_gguf(cls, m: GGUFModel) -> "T5Config":
        g = m.arch_key
        n_embd = int(g("{arch}.embedding_length"))
        n_heads = int(g("{arch}.attention.head_count"))
        tokens = m.get("tokenizer.ggml.tokens")
        return cls(
            arch=m.arch,
            n_layers=int(g("{arch}.block_count")),
            n_enc_layers=int(g("{arch}.encoder_block_count",
                               g("{arch}.block_count"))),
            n_embd=n_embd,
            n_heads=n_heads,
            head_dim=int(g("{arch}.attention.key_length", n_embd // n_heads)),
            n_ff=int(g("{arch}.feed_forward_length")),
            n_vocab=int(g("{arch}.vocab_size",
                          len(tokens) if tokens is not None else 0)),
            rms_eps=float(g("{arch}.attention.layer_norm_rms_epsilon", 1e-6)),
            rel_buckets=int(g("{arch}.attention.relative_buckets_count", 32)),
            rel_max_dist=128,
            dec_start_token=int(g("{arch}.decoder_start_token_id", 0)),
            tie_embeddings="output.weight" not in m.tensors,
            ffn_gated="dec.blk.0.ffn_gate.weight" in m.tensors,
        )


def load_t5_params(m: GGUFModel, cfg: T5Config, dtype=jnp.float32) -> dict:
    def get(name, required=True):
        ti = m.tensors.get(name)
        if ti is None:
            if required:
                raise KeyError(f"missing tensor {name}")
            return None
        return jnp.asarray(dequantize_tensor(ti), dtype=dtype)

    def block(prefix, cross):
        out = {
            "attn_norm": get(prefix + "attn_norm.weight"),
            "wq": get(prefix + "attn_q.weight"),
            "wk": get(prefix + "attn_k.weight"),
            "wv": get(prefix + "attn_v.weight"),
            "wo": get(prefix + "attn_o.weight"),
            "rel_b": get(prefix + "attn_rel_b.weight", required=False),
            "ffn_norm": get(prefix + "ffn_norm.weight"),
            "w_up": get(prefix + "ffn_up.weight"),
            "w_gate": get(prefix + "ffn_gate.weight", required=False),
            "w_down": get(prefix + "ffn_down.weight"),
        }
        if cross:
            out.update({
                "cross_norm": get(prefix + "cross_attn_norm.weight"),
                "cq": get(prefix + "cross_attn_q.weight"),
                "ck": get(prefix + "cross_attn_k.weight"),
                "cv": get(prefix + "cross_attn_v.weight"),
                "co": get(prefix + "cross_attn_o.weight"),
            })
        return out

    params = {
        "tok_embd": get("token_embd.weight"),
        "enc": [block(f"enc.blk.{i}.", False) for i in range(cfg.n_enc_layers)],
        "dec": [block(f"dec.blk.{i}.", True) for i in range(cfg.n_layers)],
        "enc_norm": get("enc.output_norm.weight"),
        "dec_norm": get("dec.output_norm.weight"),
        "output": get("output.weight", required=False),
    }
    return params


def _rel_bucket(rel_pos: np.ndarray, bidirectional: bool, num_buckets: int,
                max_dist: int) -> np.ndarray:
    """HF T5 _relative_position_bucket (bias indexed by mem_pos - ctx_pos)."""
    ret = np.zeros_like(rel_pos)
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(np.int64) * num_buckets
        n = np.abs(n)
    else:
        n = np.maximum(n, 0)
    half = num_buckets // 2
    is_small = n < half
    large = half + (
        np.log(np.maximum(n, 1) / half) / np.log(max_dist / half) * (num_buckets - half)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


def _pos_bias(rel_b: jax.Array, q_len: int, k_len: int, bidirectional: bool,
              cfg: T5Config) -> jax.Array:
    """(1, n_heads, q_len, k_len) additive bias from the (n_buckets, n_heads)
    relative-attention-bias embedding."""
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    buckets = _rel_bucket(mem - ctx, bidirectional, cfg.rel_buckets,
                          cfg.rel_max_dist)
    bias = rel_b[jnp.asarray(buckets)]  # (q, k, n_heads)
    return jnp.transpose(bias, (2, 0, 1))[None]


def _attn(x, kv_src, wq, wk, wv, wo, cfg: T5Config, bias, causal: bool):
    b, s, _ = x.shape
    t = kv_src.shape[1]
    h, hd = cfg.n_heads, cfg.head_dim
    q = (x @ wq.T).reshape(b, s, h, hd)
    k = (kv_src @ wk.T).reshape(b, t, h, hd)
    v = (kv_src @ wv.T).reshape(b, t, h, hd)
    # T5: NO 1/sqrt(hd) scaling
    scores = jnp.einsum("bshd,bthd->bhst", q, k).astype(jnp.float32)
    if bias is not None:
        scores = scores + bias
    if causal:
        mask = np.triu(np.full((s, t), -np.inf, np.float32), 1)
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhst,bthd->bshd", probs, v).reshape(b, s, h * hd)
    return out @ wo.T


def _ffn(layer, x, cfg: T5Config):
    up = x @ layer["w_up"].T
    if layer["w_gate"] is not None:  # v1.1 gated-gelu
        g = x @ layer["w_gate"].T
        act = jax.nn.gelu(g, approximate=True) * up
    else:
        act = jax.nn.relu(up)
    return act @ layer["w_down"].T


def t5_encode(params: dict, cfg: T5Config, tokens: jax.Array) -> jax.Array:
    """tokens (b, s) -> encoder hidden states (b, s, e)."""
    h = params["tok_embd"][tokens]
    rel_b = params["enc"][0]["rel_b"]
    bias = _pos_bias(rel_b, tokens.shape[1], tokens.shape[1], True, cfg) \
        if rel_b is not None else None
    for layer in params["enc"]:
        hin = rms_norm(h, layer["attn_norm"], cfg.rms_eps)
        h = h + _attn(hin, hin, layer["wq"], layer["wk"], layer["wv"],
                      layer["wo"], cfg, bias, causal=False)
        hin = rms_norm(h, layer["ffn_norm"], cfg.rms_eps)
        h = h + _ffn(layer, hin, cfg)
    return rms_norm(h, params["enc_norm"], cfg.rms_eps)


def t5_decode(params: dict, cfg: T5Config, dec_tokens: jax.Array,
              enc_hidden: jax.Array) -> jax.Array:
    """Teacher-forced decoder: (b, s_dec) + (b, s_enc, e) -> logits."""
    h = params["tok_embd"][dec_tokens]
    s = dec_tokens.shape[1]
    rel_b = params["dec"][0]["rel_b"]
    bias = _pos_bias(rel_b, s, s, False, cfg) if rel_b is not None else None
    for layer in params["dec"]:
        hin = rms_norm(h, layer["attn_norm"], cfg.rms_eps)
        h = h + _attn(hin, hin, layer["wq"], layer["wk"], layer["wv"],
                      layer["wo"], cfg, bias, causal=True)
        hin = rms_norm(h, layer["cross_norm"], cfg.rms_eps)
        h = h + _attn(hin, enc_hidden, layer["cq"], layer["ck"], layer["cv"],
                      layer["co"], cfg, None, causal=False)
        hin = rms_norm(h, layer["ffn_norm"], cfg.rms_eps)
        h = h + _ffn(layer, hin, cfg)
    h = rms_norm(h, params["dec_norm"], cfg.rms_eps)
    if params["output"] is not None:
        return h @ params["output"].T
    # tied embeddings: the d_model^-0.5 rescale (HF T5ForConditionalGeneration)
    h = h * np.float32(cfg.n_embd) ** -0.5
    return h @ params["tok_embd"].T


class T5Runtime:
    def __init__(self, cfg: T5Config, params: dict, tokenizer=None,
                 eog_ids=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.eog_ids = eog_ids or set()
        self._encode = jax.jit(lambda p, t: t5_encode(p, cfg, t))
        self._decode = jax.jit(lambda p, d, e: t5_decode(p, cfg, d, e))

    @classmethod
    def load(cls, path: str, dtype=jnp.float32) -> "T5Runtime":
        m = GGUFModel.open(path)
        cfg = T5Config.from_gguf(m)
        params = load_t5_params(m, cfg, dtype)
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

    def generate(self, input_tokens: list[int], n_predict: int = 32) -> list[int]:
        """Greedy seq2seq generation from the decoder start token."""
        enc = self._encode(self.params,
                           jnp.asarray(np.asarray(input_tokens, np.int32)[None]))
        dec = [self.cfg.dec_start_token]
        out: list[int] = []
        for _ in range(n_predict):
            logits = self._decode(
                self.params, jnp.asarray(np.asarray(dec, np.int32)[None]), enc)
            tok = int(jnp.argmax(logits[0, -1]))
            out.append(tok)
            if tok in self.eog_ids:
                break
            dec.append(tok)
        return out
