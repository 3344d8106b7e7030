"""Core transformer ops: RMSNorm, RoPE (norm/neox, YaRN), attention, SwiGLU.

Pure jnp implementations that XLA fuses well; Pallas variants of the hot
paths live in ops/attention_pallas.py and quant/pallas/. Semantics follow
the reference kernels (ggml_rope_ext, ggml_rms_norm, ggml_soft_max_ext) so
logits track llama.cpp for the same weights.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig, RopeScaling, RopeType


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMSNorm in f32 (matches ggml_rms_norm + ggml_mul)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x: jax.Array, weight: jax.Array | None, bias: jax.Array | None,
               eps: float) -> jax.Array:
    """LayerNorm in f32 (ggml_norm + optional mul/add). weight/bias None =
    the non-parametric form (LLM_NORM with NULL tensors, e.g. OLMo)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _yarn_ramp(low: float, high: float, dims: jax.Array) -> jax.Array:
    y = (dims - low) / max(high - low, 1e-3)
    return 1.0 - jnp.clip(y, 0.0, 1.0)


def _yarn_corr_dim(n_dims: int, n_ctx_orig: int, n_rot: float, base: float) -> float:
    # inverse of rope freq formula: dim where rotations == n_rot (ggml rope_yarn_corr_dim)
    return n_dims * math.log(n_ctx_orig / (n_rot * 2 * math.pi)) / (2 * math.log(base))


def rope_freqs(cfg: ModelConfig) -> tuple[jax.Array, float]:
    """Per-dim inverse frequencies (rope_dim//2,) and the YaRN mscale."""
    half = cfg.rope_dim // 2
    base = cfg.rope_base
    inv_freq = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / cfg.rope_dim))
    s = cfg.rope_scaling
    mscale = 1.0
    if s.kind == "linear":
        inv_freq = inv_freq / s.factor
    elif s.kind == "yarn":
        freq_scale = 1.0 / s.factor
        orig = s.orig_ctx or cfg.n_ctx_train
        # corr dims are PAIR indices (ggml compares them against i0/2)
        low = max(0.0, math.floor(_yarn_corr_dim(cfg.rope_dim, orig, s.beta_fast, base)))
        high = min(cfg.rope_dim / 2.0 - 1.0,
                   math.ceil(_yarn_corr_dim(cfg.rope_dim, orig, s.beta_slow, base)))
        # ramp == 1 below `low`: those high-frequency dims EXTRAPOLATE (keep
        # the original freq); dims above `high` interpolate (freq_scale)
        # — ggml rope_yarn: theta = interp*(1-ramp_mix) + extrap*ramp_mix
        # ext_factor blends extrapolation in (ggml rope_yarn: ramp_mix =
        # ramp * ext_factor; 0 degrades YaRN to plain linear interpolation
        # and skips the magnitude correction, ggml.c:14094-14109)
        ramp = _yarn_ramp(low, high, jnp.arange(half, dtype=jnp.float32))
        ext = 1.0 if s.ext_factor < 0 else s.ext_factor  # -1 = auto
        ramp_mix = ramp * ext
        inv_freq_interp = inv_freq * freq_scale
        inv_freq = inv_freq_interp * (1.0 - ramp_mix) + inv_freq * ramp_mix
        mscale = s.attn_factor
        if ext != 0.0:
            mscale = float(s.attn_factor * (1.0 + 0.1 * math.log(s.factor)))
    return inv_freq, mscale


def apply_rope(
    x: jax.Array,
    positions: jax.Array,
    inv_freq: jax.Array,
    rope_type: str,
    mscale: float = 1.0,
) -> jax.Array:
    """Rotate q/k. x: (batch, seq, heads, head_dim); positions: (batch, seq)."""
    half = inv_freq.shape[0]
    rot = 2 * half
    theta = positions[..., None].astype(jnp.float32) * inv_freq  # (b, s, half)
    cos = (jnp.cos(theta) * mscale)[:, :, None, :]  # (b, s, 1, half)
    sin = (jnp.sin(theta) * mscale)[:, :, None, :]
    xf = x.astype(jnp.float32)
    x_rot = xf[..., :rot]
    x_pass = xf[..., rot:]
    if rope_type == RopeType.NORM:
        # adjacent pairs: (x0, x1), (x2, x3), ...
        xr = x_rot.reshape(x_rot.shape[:-1] + (half, 2))
        x0, x1 = xr[..., 0], xr[..., 1]
        y0 = x0 * cos - x1 * sin
        y1 = x0 * sin + x1 * cos
        y = jnp.stack([y0, y1], axis=-1).reshape(x_rot.shape)
    else:
        # neox: split halves (x_i, x_{i+half})
        x0, x1 = x_rot[..., :half], x_rot[..., half:]
        y0 = x0 * cos - x1 * sin
        y1 = x0 * sin + x1 * cos
        y = jnp.concatenate([y0, y1], axis=-1)
    out = jnp.concatenate([y, x_pass], axis=-1) if x_pass.shape[-1] else y
    return out.astype(x.dtype)


def alibi_slopes(n_heads: int, max_bias: float) -> np.ndarray:
    """Per-head ALiBi slopes, the ggml_soft_max_ext two-regime formula
    (ggml.c:13811-13833)."""
    n_log2 = 1 << int(math.floor(math.log2(n_heads)))
    m0 = 2.0 ** (-max_bias / n_log2)
    m1 = 2.0 ** (-max_bias / 2.0 / n_log2)
    h = np.arange(n_heads)
    return np.where(h < n_log2, m0 ** (h + 1),
                    m1 ** (2 * (h - n_log2) + 1)).astype(np.float32)


def alibi_mask(pos_q: jax.Array, t: int) -> jax.Array:
    """Causal mask carrying -|pos_i - j| distances instead of zeros (the
    reference fills KQ_mask this way when use_alibi, llama_set_inputs);
    soft-max adds slope*mask per head."""
    b, s = pos_q.shape
    cols = jnp.arange(t)[None, None, :]
    visible = cols <= pos_q[:, :, None]
    dist = -jnp.abs(pos_q[:, :, None] - cols).astype(jnp.float32)
    return jnp.where(visible, dist, -jnp.inf)[:, None]  # (b,1,s,t)


def gqa_attention(
    q: jax.Array,  # (b, s, n_heads, hd)
    k: jax.Array,  # (b, t, n_kv, hd)
    v: jax.Array,  # (b, t, n_kv, hd)
    mask: jax.Array | None,  # (b, 1, s, t) additive, or None
    scale: float,
    logit_softcap: float = 0.0,
    slopes: jax.Array | None = None,  # (n_heads,) ALiBi: score += slope*mask
) -> jax.Array:
    """Grouped-query attention, f32 softmax. Returns (b, s, n_heads, hd).
    logit_softcap > 0 applies gemma2's cap*tanh(s/cap) (build_gemma2)."""
    b, s, n_heads, hd = q.shape
    n_kv = k.shape[2]
    group = n_heads // n_kv
    qg = q.reshape(b, s, n_kv, group, hd)
    scores = jnp.einsum("bsngh,btnh->bngst", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if logit_softcap:
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)
    if mask is not None:
        m = mask[:, None]  # (b,1,1,s,t)
        if slopes is not None:
            m = m * slopes.reshape(1, n_kv, group, 1, 1)
        scores = scores + m
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bngst,btnh->bsngh", probs.astype(v.dtype), v)
    return out.reshape(b, s, n_heads, hd)


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    """SiLU(gate) * up (ggml_silu + ggml_mul)."""
    g = gate.astype(jnp.float32)
    return (jax.nn.silu(g) * up.astype(jnp.float32)).astype(gate.dtype)


def geglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    """GELU(gate) * up — gemma's FFN activation (ggml_gelu, tanh approx)."""
    g = gate.astype(jnp.float32)
    gelu = 0.5 * g * (1.0 + jnp.tanh(
        np.float32(0.7978845608028654) * (g + np.float32(0.044715) * g * g * g)))
    return (gelu * up.astype(jnp.float32)).astype(gate.dtype)


def gated_act(gate: jax.Array, up: jax.Array, act: str) -> jax.Array:
    if act == "gelu":
        return geglu(gate, up)
    if act == "relu2":  # nemotron LLM_FFN_RELU_SQR: sqr(relu(x))
        r = jnp.maximum(gate.astype(jnp.float32), 0.0)
        return (r * r * up.astype(jnp.float32)).astype(gate.dtype)
    return swiglu(gate, up)


def causal_mask(pos_q: jax.Array, t: int, seq_lens: jax.Array | None = None,
                swa_window: int = 0) -> jax.Array:
    """Additive causal mask. pos_q: (b, s) absolute positions of queries;
    keys occupy cache slots [0, t). Slot j is visible iff j <= pos_q.
    swa_window > 0 additionally hides slots older than the sliding window
    (gemma2's KQ_mask_swa, build_inp_KQ_mask_swa)."""
    b, s = pos_q.shape
    cols = jnp.arange(t)[None, None, :]  # (1,1,t)
    visible = cols <= pos_q[:, :, None]  # (b, s, t)
    if swa_window:
        visible &= cols > pos_q[:, :, None] - swa_window
    if seq_lens is not None:
        visible &= cols < seq_lens[:, None, None]
    return jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)[:, None]  # (b,1,s,t)


def gqa_attention_sp(
    q: jax.Array,  # (b, s, n_heads, hd)
    k: jax.Array,  # (b, t_loc, n_kv, hd) — THIS shard's slice of the cache
    v: jax.Array,
    mask: jax.Array,  # (b, 1, s, t_loc) additive, shard-local columns
    scale: float,
    axis: str,  # mesh axis the sequence is sharded over
) -> jax.Array:
    """Sequence-parallel GQA: each shard attends over its local KV block,
    then the softmax combines across `axis` with the log-sum-exp trick
    (blockwise / ring attention over the mesh — the long-context scaling
    axis the reference handles only via context-shift/Self-Extend,
    SURVEY §5.7). Numerically identical to gqa_attention over the
    concatenated cache."""
    b, s, n_heads, hd = q.shape
    n_kv = k.shape[2]
    group = n_heads // n_kv
    qg = q.reshape(b, s, n_kv, group, hd)
    scores = jnp.einsum("bsngh,btnh->bngst", qg, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + mask[:, None]
    m_loc = jnp.max(scores, axis=-1, keepdims=True)  # (b,n,g,s,1)
    m = jax.lax.pmax(m_loc, axis)
    # a shard whose whole block is masked contributes exp(-inf - m) = 0;
    # position 0 is always visible somewhere so m is finite
    p = jnp.exp(scores - m)
    l = jax.lax.psum(jnp.sum(p, axis=-1, keepdims=True), axis)
    acc = jax.lax.psum(
        jnp.einsum("bngst,btnh->bsngh", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32), axis)
    l_t = jnp.maximum(l[..., 0], 1e-30).transpose(0, 3, 1, 2)  # (b,s,n,g)
    out = acc / l_t[..., None].astype(jnp.float32)
    return out.reshape(b, s, n_heads, hd).astype(q.dtype)
