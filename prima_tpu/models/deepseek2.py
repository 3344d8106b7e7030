"""DeepSeek-V2: multi-head latent attention (MLA) + fine-grained MoE.

The LLM_ARCH_DEEPSEEK2 analogue (build_deepseek2, src/llama.cpp — the
"naive" full multi-head MLA formulation): queries optionally go through a
LoRA bottleneck (q_a -> RMSNorm -> q_b), keys/values decompress from one
shared latent (kv_a_mqa -> RMSNorm -> kv_b) with a single shared RoPE key
head; per-head dims differ between q/k (qk_nope + qk_rope) and v. The FFN
is dense for the first `leading_dense_block_count` layers, then MoE with
unnormalized softmax router weights scaled by expert_weights_scale plus an
ungated shared expert.

This module is a correctness-tier runtime (full-sequence forward + greedy
generation that recomputes the prefix); the decoder-only families own the
incremental KV-cache path.
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
class DeepseekV2Config:
    arch: str
    n_layers: int
    n_embd: int
    n_heads: int
    qk_rope: int
    qk_nope: int
    v_head_dim: int
    q_lora_rank: int  # 0 = lite (direct wq)
    kv_lora_rank: int
    n_ff: int
    n_dense_lead: int
    n_expert: int
    n_expert_used: int
    n_expert_shared: int
    expert_weights_scale: float
    n_vocab: int
    rms_eps: float
    rope_base: float
    # YaRN rope-scaling metadata ({arch}.rope.scaling.*). Real DS2/DS2-Lite
    # GGUFs ship factor~40 + yarn_log_multiplier; the reference pre-scales
    # kq_scale by mscale^2 and cancels the rope magnitude scale
    # (build_deepseek2, src/llama.cpp:15456-15460).
    rope_scaling: str = "none"
    rope_factor: float = 1.0
    rope_orig_ctx: int = 0
    rope_attn_factor: float = 1.0
    yarn_log_mul: float = 0.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    # minicpm3 (build_minicpm3, src/llama.cpp:14016-14023): the MLA
    # attention rides the minicpm residual/embedding/logit scalings and
    # LongRoPE per-dim frequency factors (rope_factors_long/short tensors)
    embd_scale: float = 1.0
    residual_scale: float = 1.0
    logit_scale: float = 1.0

    @classmethod
    def from_gguf(cls, m: GGUFModel) -> "DeepseekV2Config":
        g = m.arch_key
        tokens = m.get("tokenizer.ggml.tokens")
        qk_rope = int(g("{arch}.rope.dimension_count"))
        key_len = int(g("{arch}.attention.key_length"))
        extra = {}
        if m.arch == "minicpm3":
            n_layer = int(g("{arch}.block_count"))
            n_embd = int(g("{arch}.embedding_length"))
            extra = dict(
                embd_scale=float(g("{arch}.embedding_scale", 12.0) or 12.0),
                residual_scale=float(g("{arch}.residual_scale",
                                       1.4 / n_layer ** 0.5)
                               or 1.4 / n_layer ** 0.5),
                logit_scale=float(g("{arch}.logit_scale", 256.0 / n_embd)
                                  or 256.0 / n_embd),
            )
        return cls(
            **extra,
            arch=m.arch,
            n_layers=int(g("{arch}.block_count")),
            n_embd=int(g("{arch}.embedding_length")),
            n_heads=int(g("{arch}.attention.head_count")),
            qk_rope=qk_rope,
            qk_nope=key_len - qk_rope,
            v_head_dim=int(g("{arch}.attention.value_length")),
            q_lora_rank=int(g("{arch}.attention.q_lora_rank", 0) or 0),
            kv_lora_rank=int(g("{arch}.attention.kv_lora_rank")),
            n_ff=int(g("{arch}.feed_forward_length")),
            n_dense_lead=int(g("{arch}.leading_dense_block_count", 0) or 0),
            n_expert=int(g("{arch}.expert_count", 0) or 0),
            n_expert_used=int(g("{arch}.expert_used_count", 0) or 0),
            n_expert_shared=int(g("{arch}.expert_shared_count", 0) or 0),
            expert_weights_scale=float(g("{arch}.expert_weights_scale", 1.0)
                                       or 1.0),
            n_vocab=int(g("{arch}.vocab_size",
                          len(tokens) if tokens is not None else 0)),
            rms_eps=float(g("{arch}.attention.layer_norm_rms_epsilon", 1e-6)),
            rope_base=float(g("{arch}.rope.freq_base", 10000.0)),
            rope_scaling=str(g("{arch}.rope.scaling.type", "none") or "none"),
            rope_factor=float(g("{arch}.rope.scaling.factor", 1.0) or 1.0),
            rope_orig_ctx=int(
                g("{arch}.rope.scaling.original_context_length", 0) or 0),
            rope_attn_factor=float(
                g("{arch}.rope.scaling.attention_factor", 1.0) or 1.0),
            yarn_log_mul=float(
                g("{arch}.rope.scaling.yarn_log_multiplier", 0.0) or 0.0),
            beta_fast=float(
                g("{arch}.rope.scaling.yarn_beta_fast", 32.0) or 32.0),
            beta_slow=float(
                g("{arch}.rope.scaling.yarn_beta_slow", 1.0) or 1.0),
        )


def load_deepseek2_params(m: GGUFModel, cfg: DeepseekV2Config,
                          dtype=jnp.float32) -> dict:
    def get(name, required=True):
        ti = m.tensors.get(name)
        if ti is None:
            if required:
                raise KeyError(f"missing tensor {name}")
            return None
        return jnp.asarray(dequantize_tensor(ti), dtype=dtype)

    params: dict = {"tok_embd": get("token_embd.weight"), "layers": []}
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layer = {
            "attn_norm": get(p + "attn_norm.weight"),
            "kv_a_mqa": get(p + "attn_kv_a_mqa.weight"),
            "kv_a_norm": get(p + "attn_kv_a_norm.weight"),
            "kv_b": get(p + "attn_kv_b.weight"),
            "wo": get(p + "attn_output.weight"),
            "ffn_norm": get(p + "ffn_norm.weight"),
        }
        if cfg.q_lora_rank:
            layer["wq_a"] = get(p + "attn_q_a.weight")
            layer["q_a_norm"] = get(p + "attn_q_a_norm.weight")
            layer["wq_b"] = get(p + "attn_q_b.weight")
        else:
            layer["wq"] = get(p + "attn_q.weight")
        if i < cfg.n_dense_lead or not cfg.n_expert:
            layer["w_gate"] = get(p + "ffn_gate.weight")
            layer["w_up"] = get(p + "ffn_up.weight")
            layer["w_down"] = get(p + "ffn_down.weight")
        else:
            layer["gate_inp"] = get(p + "ffn_gate_inp.weight")
            for nm in ("ffn_gate_exps", "ffn_up_exps", "ffn_down_exps"):
                t = get(p + nm + ".weight")
                if t.ndim == 2:
                    t = t.reshape(cfg.n_expert, t.shape[0] // cfg.n_expert,
                                  t.shape[1])
                layer[nm] = t
            layer["gate_shexp"] = get(p + "ffn_gate_shexp.weight")
            layer["up_shexp"] = get(p + "ffn_up_shexp.weight")
            layer["down_shexp"] = get(p + "ffn_down_shexp.weight")
        params["layers"].append(layer)
    params["output_norm"] = get("output_norm.weight")
    params["output"] = get("output.weight", required=False)
    # minicpm3 LongRoPE per-dim frequency factors (model-level tensors,
    # loader @7746; selected by context length in build_rope_factors @10816)
    params["rope_long"] = get("rope_factors_long.weight", required=False)
    params["rope_short"] = get("rope_factors_short.weight", required=False)
    return params


def _rope_params(cfg: DeepseekV2Config) -> tuple[np.ndarray, float, float]:
    """(inv_freq over rope dims, rope magnitude scale, kq_scale).

    YaRN handling mirrors build_deepseek2 (src/llama.cpp:15456-15460): the
    attention scale is pre-multiplied by mscale^2 (mscale uses the GGUF
    yarn_log_multiplier) and rope is run with attn_factor_scaled =
    1/(1 + 0.1*ln(1/freq_scale)), which cancels ggml rope_yarn's own
    (1 + 0.1*ln(1/freq_scale)) magnitude factor.
    """
    import math

    from ..ops.layers import _yarn_corr_dim, _yarn_ramp

    d = cfg.qk_rope
    half = d // 2
    qk = cfg.qk_nope + cfg.qk_rope
    inv = 1.0 / (cfg.rope_base ** (np.arange(half, dtype=np.float32) * 2.0 / d))
    if cfg.rope_scaling != "yarn" or cfg.rope_factor <= 0:
        return inv, 1.0, 1.0 / math.sqrt(qk)
    freq_scale = 1.0 / cfg.rope_factor
    mscale = cfg.rope_attn_factor * (
        1.0 + cfg.yarn_log_mul * math.log(1.0 / freq_scale))
    kq_scale = mscale * mscale / math.sqrt(qk)
    attn_factor_scaled = cfg.rope_attn_factor / (
        1.0 + 0.1 * math.log(1.0 / freq_scale))
    orig = cfg.rope_orig_ctx or 4096
    low = max(0.0, math.floor(_yarn_corr_dim(d, orig, cfg.beta_fast,
                                             cfg.rope_base)))
    high = min(d / 2.0 - 1.0, math.ceil(_yarn_corr_dim(d, orig, cfg.beta_slow,
                                                       cfg.rope_base)))
    ramp = np.asarray(_yarn_ramp(low, high,
                                 jnp.arange(half, dtype=jnp.float32)))
    inv_yarn = inv * freq_scale * (1.0 - ramp) + inv * ramp
    # net rope magnitude: ggml rope_yarn multiplies the passed attn_factor
    # by (1 + 0.1*ln(1/freq_scale)) when ext_factor != 0
    rope_mscale = attn_factor_scaled * (
        1.0 + 0.1 * math.log(1.0 / freq_scale))
    return inv_yarn.astype(np.float32), float(rope_mscale), float(kq_scale)


def _rope_interleaved(x: jax.Array, pos: np.ndarray, inv: np.ndarray,
                      mscale: float = 1.0, factors=None,
                      neox: bool = False) -> jax.Array:
    """Rope over the full last dim of x (b,s,h,d): NORM (adjacent pairs,
    deepseek2) or NEOX (split halves, minicpm3). `factors` are per-dim
    LongRoPE divisors (ggml rope freq_factors semantics)."""
    d = x.shape[-1]
    half = d // 2
    inv = jnp.asarray(inv)
    if factors is not None:
        inv = inv / factors.astype(inv.dtype)
    theta = pos[..., None].astype(np.float32) * inv  # (b,s,half)
    cos = (jnp.cos(theta) * mscale)[:, :, None, :]
    sin = (jnp.sin(theta) * mscale)[:, :, None, :]
    if neox:
        x0, x1 = x[..., :half], x[..., half:]
        return jnp.concatenate([x0 * cos - x1 * sin,
                                x0 * sin + x1 * cos], axis=-1)
    xr = x.reshape(x.shape[:-1] + (half, 2))
    x0, x1 = xr[..., 0], xr[..., 1]
    y0 = x0 * cos - x1 * sin
    y1 = x0 * sin + x1 * cos
    return jnp.stack([y0, y1], axis=-1).reshape(x.shape)


def _silu_mlp(x, wg, wu, wd):
    return jax.nn.silu(x @ wg.T) * (x @ wu.T) @ wd.T


def deepseek2_forward(params: dict, cfg: DeepseekV2Config,
                      tokens: jax.Array) -> jax.Array:
    """Teacher-forced full-sequence forward -> logits (b, s, vocab)."""
    b, s = tokens.shape
    h = cfg.n_heads
    qk = cfg.qk_nope + cfg.qk_rope
    pos = np.broadcast_to(np.arange(s, dtype=np.int32), (b, s))
    x = params["tok_embd"][tokens]
    if cfg.embd_scale != 1.0:  # minicpm3 (@14035)
        x = x * np.float32(cfg.embd_scale)
    rope_inv, rope_mscale, kq_scale = _rope_params(cfg)
    neox = cfg.arch == "minicpm3"  # rope-type table @21548
    if neox:
        kq_scale = 1.0 / np.sqrt(cfg.qk_nope + cfg.qk_rope)  # @14023
    # LongRoPE: long factors past the original ctx, short inside (@10816)
    factors = None
    if params.get("rope_short") is not None:
        factors = (params["rope_long"]
                   if cfg.rope_orig_ctx and s > cfg.rope_orig_ctx
                   and params.get("rope_long") is not None
                   else params["rope_short"])
    rscale = np.float32(cfg.residual_scale)
    mask = np.triu(np.full((s, s), -np.inf, np.float32), 1)

    for i, layer in enumerate(params["layers"]):
        xin = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        if cfg.q_lora_rank:
            q = rms_norm(xin @ layer["wq_a"].T, layer["q_a_norm"], cfg.rms_eps)
            q = q @ layer["wq_b"].T
        else:
            q = xin @ layer["wq"].T
        q = q.reshape(b, s, h, qk)
        q_nope, q_pe = q[..., :cfg.qk_nope], q[..., cfg.qk_nope:]

        kv_c = xin @ layer["kv_a_mqa"].T  # (b,s, kv_lora + qk_rope)
        k_pe = kv_c[..., cfg.kv_lora_rank:][:, :, None, :]  # one shared head
        kv_c = rms_norm(kv_c[..., :cfg.kv_lora_rank], layer["kv_a_norm"],
                        cfg.rms_eps)
        kv = (kv_c @ layer["kv_b"].T).reshape(
            b, s, h, cfg.qk_nope + cfg.v_head_dim)
        k_nope, v = kv[..., :cfg.qk_nope], kv[..., cfg.qk_nope:]

        q_pe = _rope_interleaved(q_pe, pos, rope_inv, rope_mscale,
                                 factors=factors, neox=neox)
        k_pe = _rope_interleaved(k_pe, pos, rope_inv, rope_mscale,
                                 factors=factors, neox=neox)
        qs = jnp.concatenate([q_nope, q_pe], axis=-1)
        ks = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, k_nope.shape[:-1] + (cfg.qk_rope,))],
            axis=-1)

        scores = jnp.einsum("bshd,bthd->bhst", qs, ks) * kq_scale + mask
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        attn = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v)
        x = x + rscale * (attn.reshape(b, s, h * cfg.v_head_dim)
                          @ layer["wo"].T)

        fin = rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
        if "w_gate" in layer:
            x = x + rscale * _silu_mlp(fin, layer["w_gate"], layer["w_up"],
                                       layer["w_down"])
        else:
            logits = fin @ layer["gate_inp"].T
            pr = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            w, ids = jax.lax.top_k(pr, cfg.n_expert_used)
            # norm_w=false, scale_w=true (build_deepseek2 moe args)
            w = (w * np.float32(cfg.expert_weights_scale)).astype(fin.dtype)
            moe = jnp.zeros_like(fin)
            for e in range(cfg.n_expert):
                sel = jnp.sum(jnp.where(ids == e, w, 0.0), axis=-1)
                ye = _silu_mlp(fin, layer["ffn_gate_exps"][e],
                               layer["ffn_up_exps"][e],
                               layer["ffn_down_exps"][e])
                moe = moe + sel[..., None] * ye
            moe = moe + _silu_mlp(fin, layer["gate_shexp"],
                                  layer["up_shexp"], layer["down_shexp"])
            x = x + rscale * moe
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    if cfg.logit_scale != 1.0:  # minicpm3 n_embd_base/n_embd (@14212)
        x = x * np.float32(cfg.logit_scale)
    w_out = params["output"] if params["output"] is not None else params["tok_embd"]
    return x @ w_out.T


class DeepseekV2Runtime:
    def __init__(self, cfg: DeepseekV2Config, params: dict, tokenizer=None,
                 eog_ids=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.eog_ids = eog_ids or set()
        self._fwd = jax.jit(lambda p, t: deepseek2_forward(p, cfg, t))

    @classmethod
    def load(cls, path: str, dtype=jnp.float32) -> "DeepseekV2Runtime":
        m = GGUFModel.open(path)
        cfg = DeepseekV2Config.from_gguf(m)
        params = load_deepseek2_params(m, cfg, dtype)
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
        toks = list(prompt_tokens)
        out: list[int] = []
        for _ in range(n_predict):
            logits = self._fwd(self.params,
                               jnp.asarray(np.asarray(toks, np.int32)[None]))
            tok = int(jnp.argmax(logits[0, -1]))
            out.append(tok)
            if tok in self.eog_ids:
                break
            toks.append(tok)
        return out
