"""BERT-family encoder models — true embedding-model support.

The analogue of the reference's LLM_ARCH_BERT path (build_bert
src/llama.cpp, served by llama-server --embeddings): token + type +
position embeddings, post-norm transformer encoder with bidirectional
attention, biased LayerNorms, plain GELU FFN, and CLS / mean / none
pooling (llama_pooling_type). Weights may be any supported GGUF quant
type; the WPM tokenizer (tokenizer/wpm.py) handles the vocabulary.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..quant.dequant_jax import QTensor
from .llama import _to_device_tensor, embed as embed_rows, linear


class PoolingType:
    NONE = 0
    MEAN = 1
    CLS = 2
    LAST = 3


@dataclass
class BertConfig:
    arch: str
    n_layers: int
    n_embd: int
    n_heads: int
    n_ff: int
    n_vocab: int
    n_ctx_train: int
    ln_eps: float
    pooling: int = PoolingType.MEAN
    name: str = ""
    # jina-bert-v2 (build_bert's LLM_ARCH_JINA_BERT_V2 branches): no
    # position embeddings — bidirectional ALiBi (f_max_alibi_bias=8,
    # llm_load_hparams @6062) — and a gated-GELU FFN (@12197)
    alibi_max_bias: float = 0.0
    gated_ffn: bool = False

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_heads

    @classmethod
    def from_gguf(cls, m: GGUFModel) -> "BertConfig":
        arch = m.arch
        assert arch in ("bert", "nomic-bert", "jina-bert-v2"), arch
        g = m.arch_key
        extra = {}
        if arch == "jina-bert-v2":
            extra = {"alibi_max_bias": 8.0, "gated_ffn": True}
        return cls(
            arch=arch,
            n_layers=int(g("{arch}.block_count")),
            n_embd=int(g("{arch}.embedding_length")),
            n_heads=int(g("{arch}.attention.head_count")),
            n_ff=int(g("{arch}.feed_forward_length")),
            n_vocab=int(g("{arch}.vocab_size", 0) or
                        len(m.get("tokenizer.ggml.tokens"))),
            n_ctx_train=int(g("{arch}.context_length", 512)),
            ln_eps=float(g("{arch}.attention.layer_norm_epsilon", 1e-12)),
            pooling=int(g("{arch}.pooling_type", PoolingType.MEAN) or PoolingType.MEAN),
            name=str(m.get("general.name", "")),
            **extra,
        )


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def load_bert_params(m: GGUFModel, cfg: BertConfig, dtype=jnp.float32) -> dict:
    t = m.tensors

    def get(name, dense=False, required=True):
        ti = t.get(name)
        if ti is None:
            if required:
                raise KeyError(f"missing tensor {name}")
            return None
        return _to_device_tensor(ti, dtype, dense)

    params: dict[str, Any] = {
        "tok_embd": get("token_embd.weight"),
        "type_embd": get("token_types.weight", dense=True),
        # jina-bert-v2 has no position embeddings (ALiBi instead)
        "pos_embd": get("position_embd.weight", dense=True,
                        required=not cfg.alibi_max_bias),
        "tok_norm": get("token_embd_norm.weight", dense=True),
        "tok_norm_b": get("token_embd_norm.bias", dense=True),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layer = {
            "wq": get(p + "attn_q.weight"), "bq": get(p + "attn_q.bias", dense=True),
            "wk": get(p + "attn_k.weight"), "bk": get(p + "attn_k.bias", dense=True),
            "wv": get(p + "attn_v.weight"), "bv": get(p + "attn_v.bias", dense=True),
            "wo": get(p + "attn_output.weight"),
            "bo": get(p + "attn_output.bias", dense=True),
            "attn_norm": get(p + "attn_output_norm.weight", dense=True),
            "attn_norm_b": get(p + "attn_output_norm.bias", dense=True),
            "w_up": get(p + "ffn_up.weight"),
            "b_up": get(p + "ffn_up.bias", dense=True,
                        required=not cfg.gated_ffn),
            "w_down": get(p + "ffn_down.weight"),
            "b_down": get(p + "ffn_down.bias", dense=True),
            "out_norm": get(p + "layer_output_norm.weight", dense=True),
            "out_norm_b": get(p + "layer_output_norm.bias", dense=True),
        }
        if cfg.gated_ffn:  # jina: ungated-bias gate projection
            layer["w_gate"] = get(p + "ffn_gate.weight")
        # jina optional q/k LayerNorms (loader @8035-8044) and the extra
        # attn_norm_2 post-residual norm (@8059-8060)
        for nm, key in ((p + "attn_q_norm.weight", "q_norm"),
                        (p + "attn_q_norm.bias", "q_norm_b"),
                        (p + "attn_k_norm.weight", "k_norm"),
                        (p + "attn_k_norm.bias", "k_norm_b"),
                        (p + "attn_norm_2.weight", "norm_2"),
                        (p + "attn_norm_2.bias", "norm_2_b")):
            v = get(nm, dense=True, required=False)
            if v is not None:
                layer[key] = v
        params["layers"].append(layer)
    # optional classification / rank head (LLM_TENSOR_CLS / CLS_OUT —
    # reranker models; reference RANK pooling src/llama.cpp:10919-10940)
    params["cls"] = get("cls.weight", dense=True, required=False)
    params["cls_b"] = get("cls.bias", dense=True, required=False)
    params["cls_out"] = get("cls.output.weight", dense=True, required=False)
    params["cls_out_b"] = get("cls.output.bias", dense=True, required=False)
    return params


def _gelu(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(
        np.float32(0.7978845608028654) * (xf + np.float32(0.044715) * xf ** 3)))
    return y.astype(x.dtype)


def bert_forward(params: dict, cfg: BertConfig, tokens: jax.Array,
                 attn_mask: jax.Array | None = None,
                 matmul_impl: str = "xla") -> jax.Array:
    """tokens: (b, s) -> hidden states (b, s, e). attn_mask: (b, s) 1/0."""
    b, s = tokens.shape
    h, hd = cfg.n_heads, cfg.head_dim
    x = embed_rows(params["tok_embd"], tokens, jnp.float32)
    x = x + params["type_embd"][0].astype(x.dtype)  # token type 0 (build_bert)
    if params.get("pos_embd") is not None:
        x = x + params["pos_embd"][:s][None].astype(x.dtype)
    x = layer_norm(x, params["tok_norm"], params["tok_norm_b"], cfg.ln_eps)

    if attn_mask is None:
        attn_mask = jnp.ones((b, s), jnp.float32)
    bias = jnp.where(attn_mask[:, None, None, :] > 0, 0.0, -jnp.inf)
    if cfg.alibi_max_bias:
        # jina-bert-v2: bidirectional ALiBi — the KQ mask carries
        # -|pos_i - pos_j| scaled by per-head slopes (llama.cpp:17391,
        # ggml soft_max_ext max_bias path)
        from ..ops.layers import alibi_slopes

        slopes = jnp.asarray(alibi_slopes(h, cfg.alibi_max_bias),
                             jnp.float32)
        dist = -jnp.abs(jnp.arange(s)[:, None] - jnp.arange(s)[None, :])
        bias = bias + (slopes[:, None, None]
                       * dist[None].astype(jnp.float32))[None]

    for layer in params["layers"]:
        x_in = x
        q = linear(x, layer["wq"], matmul_impl) + layer["bq"]
        k = linear(x, layer["wk"], matmul_impl) + layer["bk"]
        v = linear(x, layer["wv"], matmul_impl) + layer["bv"]
        if layer.get("q_norm") is not None:  # jina optional q/k LayerNorms
            q = layer_norm(q, layer["q_norm"], layer["q_norm_b"], cfg.ln_eps)
            k = layer_norm(k, layer["k_norm"], layer["k_norm_b"], cfg.ln_eps)
        q = q.reshape(b, s, h, hd)
        k = k.reshape(b, s, h, hd)
        v = v.reshape(b, s, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        attn = linear(attn.reshape(b, s, h * hd), layer["wo"], matmul_impl) + layer["bo"]
        x = layer_norm(x + attn, layer["attn_norm"], layer["attn_norm_b"], cfg.ln_eps)
        if layer.get("norm_2") is not None:
            # jina attn_norm_2: re-add the LAYER INPUT and norm again
            # (build_bert @12185-12188)
            x = layer_norm(x + x_in, layer["norm_2"], layer["norm_2_b"],
                           cfg.ln_eps)
        if cfg.gated_ffn and layer.get("w_gate") is not None:
            up = linear(x, layer["w_up"], matmul_impl)
            gate = linear(x, layer["w_gate"], matmul_impl)
            ff = linear(_gelu(gate) * up, layer["w_down"], matmul_impl) \
                + layer["b_down"]
        else:
            ff = linear(x, layer["w_up"], matmul_impl) + layer["b_up"]
            ff = linear(_gelu(ff), layer["w_down"], matmul_impl) + layer["b_down"]
        x = layer_norm(x + ff, layer["out_norm"], layer["out_norm_b"], cfg.ln_eps)
    return x


def pool(hidden: jax.Array, attn_mask: jax.Array, pooling: int) -> jax.Array:
    """(b, s, e) -> (b, e) per llama_pooling_type semantics."""
    if pooling == PoolingType.CLS:
        return hidden[:, 0]
    if pooling == PoolingType.LAST:
        last = jnp.sum(attn_mask, axis=1).astype(jnp.int32) - 1
        return hidden[jnp.arange(hidden.shape[0]), last]
    if pooling == PoolingType.MEAN:
        m = attn_mask[:, :, None].astype(hidden.dtype)
        return jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1)
    return hidden.reshape(hidden.shape[0], -1)  # NONE: caller handles


@dataclass
class BertModelRuntime:
    """Loaded encoder + tokenizer: the embedding-serving unit."""

    cfg: BertConfig
    params: dict
    tokenizer: Any

    @classmethod
    def load(cls, path: str, dtype=jnp.float32) -> "BertModelRuntime":
        from ..tokenizer import Tokenizer

        m = GGUFModel.open(path)
        cfg = BertConfig.from_gguf(m)
        params = load_bert_params(m, cfg, dtype)
        tok = Tokenizer.from_gguf(m)
        m.close()
        return cls(cfg, params, tok)

    def embed(self, texts: list[str], normalize: bool = True,
              matmul_impl: str = "xla",
              pooling: int | None = None) -> np.ndarray:
        """-> (n, e) pooled (and L2-normalized, like the server's
        embedding endpoint) sentence embeddings. pooling overrides the
        model's pooling_type (the --pooling flag, embedding.cpp)."""
        if pooling is None:
            pooling = self.cfg.pooling or PoolingType.MEAN
        out = []
        for text in texts:
            ids = self.tokenizer.encode(text, add_special=True)
            toks = jnp.asarray(np.asarray(ids, np.int32)[None])
            hidden = bert_forward(self.params, self.cfg, toks,
                                  matmul_impl=matmul_impl)
            vec = np.asarray(
                pool(hidden, jnp.ones_like(toks, jnp.float32),
                     pooling)[0], np.float32)
            if normalize:
                vec = vec / (np.linalg.norm(vec) + 1e-8)
            out.append(vec)
        return np.stack(out)

    @property
    def has_rank_head(self) -> bool:
        return self.params.get("cls") is not None

    def rerank(self, query: str, documents: list[str],
               matmul_impl: str = "xla") -> np.ndarray:
        """Relevance scores via the classification head (RANK pooling,
        reference src/llama.cpp:10919-10940): the pair is encoded as
        [BOS]query[EOS][SEP]doc[EOS] (server.cpp:2164-2177), the CLS
        hidden goes through cls->tanh->cls_out. Falls back to cosine
        similarity of pooled embeddings when no head is present."""
        if not self.has_rank_head:
            qv = self.embed([query])[0]
            dv = self.embed(documents)
            return dv @ qv
        v = self.tokenizer.vocab
        bos = v.cls_id if v.cls_id >= 0 else v.bos_id
        sep = v.sep_id if v.sep_id >= 0 else v.eos_id
        eos = sep  # WPM models: llama_token_eos resolves to [SEP]
        scores = []
        for doc in documents:
            ids = ([bos] + self.tokenizer.encode(query, add_special=False)
                   + [eos, sep]
                   + self.tokenizer.encode(doc, add_special=False) + [eos])
            toks = jnp.asarray(np.asarray(ids, np.int32)[None])
            hidden = bert_forward(self.params, self.cfg, toks,
                                  matmul_impl=matmul_impl)
            h = hidden[:, 0]  # CLS token
            s = jnp.tanh(h @ self.params["cls"].T
                         + self.params["cls_b"])
            if self.params.get("cls_out") is not None:
                s = s @ self.params["cls_out"].T + self.params["cls_out_b"]
            scores.append(float(np.asarray(s)[0, 0]))
        return np.asarray(scores, np.float32)
