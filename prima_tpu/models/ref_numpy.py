"""Pure-numpy reference forward pass (tests only).

An independent implementation of the same architecture used to cross-check
the JAX forward — the analogue of the reference's CPU-vs-backend comparison
harness (tests/test-backend-ops.cpp pattern).
"""

from __future__ import annotations

import numpy as np

from ..models.config import ModelConfig, RopeType


def rms_norm(x, w, eps):
    var = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    return (x / np.sqrt(var + eps) * w).astype(np.float32)


def layer_norm(x, w, b, eps):
    xf = x.astype(np.float64)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) / np.sqrt(var + eps)
    if w is not None:
        y = y * w
    if b is not None:
        y = y + b
    return y.astype(np.float32)


def rope(x, positions, base, rope_dim, rope_type):
    # x: (b, s, h, hd)
    half = rope_dim // 2
    inv_freq = 1.0 / (base ** (np.arange(half, dtype=np.float64) * 2.0 / rope_dim))
    theta = positions[..., None] * inv_freq  # (b, s, half)
    cos = np.cos(theta)[:, :, None, :]
    sin = np.sin(theta)[:, :, None, :]
    y = x.astype(np.float64).copy()
    if rope_type == RopeType.NORM:
        x0 = x[..., 0:rope_dim:2]
        x1 = x[..., 1:rope_dim:2]
        y[..., 0:rope_dim:2] = x0 * cos - x1 * sin
        y[..., 1:rope_dim:2] = x0 * sin + x1 * cos
    else:
        x0 = x[..., :half]
        x1 = x[..., half:rope_dim]
        y[..., :half] = x0 * cos - x1 * sin
        y[..., half:rope_dim] = x0 * sin + x1 * cos
    return y.astype(np.float32)


def forward_np(weights: dict, cfg: ModelConfig, tokens: np.ndarray) -> np.ndarray:
    """weights: dict of dense f32 arrays keyed by GGUF tensor names.
    tokens: (b, s). Returns logits (b, s, vocab). Full-sequence prefill."""
    b, s = tokens.shape
    h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    x = weights["token_embd.weight"][tokens]  # (b, s, e)
    if cfg.embd_scale != 1.0:
        x = x * np.float32(cfg.embd_scale)
    positions = np.broadcast_to(np.arange(s, dtype=np.float64), (b, s))
    rscale = np.float32(cfg.residual_scale)

    def norm(v, wkey):
        if cfg.norm_type == "ln":
            return layer_norm(v, weights.get(wkey), weights.get(
                wkey.replace(".weight", ".bias")), cfg.rms_eps)
        return rms_norm(v, weights[wkey], cfg.rms_eps)

    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        xin = norm(x, p + "attn_norm.weight")
        q = xin @ weights[p + "attn_q.weight"].T
        k = xin @ weights[p + "attn_k.weight"].T
        v = xin @ weights[p + "attn_v.weight"].T
        if cfg.qkv_bias:
            q = q + weights[p + "attn_q.bias"]
            k = k + weights[p + "attn_k.bias"]
            v = v + weights[p + "attn_v.bias"]
        q = q.reshape(b, s, h, hd)
        k = k.reshape(b, s, kvh, hd)
        v = v.reshape(b, s, kvh, hd)
        q = rope(q, positions, cfg.rope_base, cfg.rope_dim, cfg.rope_type)
        k = rope(k, positions, cfg.rope_base, cfg.rope_dim, cfg.rope_type)
        group = h // kvh
        qg = q.reshape(b, s, kvh, group, hd)
        scores = np.einsum("bsngh,btnh->bngst", qg, k) / np.sqrt(hd)
        mask = np.triu(np.full((s, s), -np.inf), 1)
        scores = scores + mask
        scores = scores - scores.max(axis=-1, keepdims=True)
        probs = np.exp(scores)
        probs /= probs.sum(axis=-1, keepdims=True)
        attn = np.einsum("bngst,btnh->bsngh", probs, v).reshape(b, s, h * hd)
        x = x + rscale * (attn @ weights[p + "attn_output.weight"].T)

        xin = norm(x, p + "ffn_norm.weight")
        gate = xin @ weights[p + "ffn_gate.weight"].T
        up = xin @ weights[p + "ffn_up.weight"].T
        act = gate / (1.0 + np.exp(-gate)) * up
        x = x + rscale * (act @ weights[p + "ffn_down.weight"].T)

    x = norm(x, "output_norm.weight")
    if cfg.logit_scale != 1.0:
        x = x * np.float32(cfg.logit_scale)
    w_out = weights.get("output.weight", weights["token_embd.weight"])
    return x @ w_out.T
