"""Backend-ops harness: every compute op vs a float64 numpy reference.

The analogue of the reference's tests/test-backend-ops.cpp (its most
important harness): each op runs on the available backend(s) and is
compared against an independent high-precision implementation with an NMSE
tolerance. Pallas kernels run in interpret mode on the CPU mesh; on real
TPU the same tests bound the hardware kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.models.config import RopeType, tiny_config
from prima_tpu.ops.layers import apply_rope, causal_mask, gqa_attention, rms_norm, rope_freqs, swiglu


def nmse(got: np.ndarray, want: np.ndarray) -> float:
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    denom = np.mean(want * want) + 1e-30
    return float(np.mean((got - want) ** 2) / denom)


RNG = np.random.default_rng(0)


def test_rms_norm_nmse():
    x = RNG.standard_normal((2, 5, 64)).astype(np.float32)
    w = RNG.standard_normal(64).astype(np.float32)
    eps = 1e-5
    xf = x.astype(np.float64)
    want = xf / np.sqrt((xf ** 2).mean(-1, keepdims=True) + eps) * w.astype(np.float64)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps)
    assert nmse(got, want) < 1e-12


@pytest.mark.parametrize("rope_type", [RopeType.NORM, RopeType.NEOX])
def test_rope_nmse(rope_type):
    b, s, h, d = 1, 4, 2, 16
    x = RNG.standard_normal((b, s, h, d)).astype(np.float32)
    pos = np.arange(7, 7 + s, dtype=np.int32)[None]
    inv = (1.0 / 10000.0 ** (np.arange(0, d // 2) * 2.0 / d)).astype(np.float32)
    got = apply_rope(jnp.asarray(x), jnp.asarray(pos), jnp.asarray(inv), rope_type)

    xf = x.astype(np.float64)
    theta = pos[0][:, None].astype(np.float64) * inv.astype(np.float64)  # (s, d/2)
    cos, sin = np.cos(theta), np.sin(theta)
    want = np.empty_like(xf)
    for si in range(s):
        for hi in range(h):
            v = xf[0, si, hi]
            if rope_type == RopeType.NORM:
                for i in range(d // 2):
                    x0, x1 = v[2 * i], v[2 * i + 1]
                    want[0, si, hi, 2 * i] = x0 * cos[si, i] - x1 * sin[si, i]
                    want[0, si, hi, 2 * i + 1] = x0 * sin[si, i] + x1 * cos[si, i]
            else:
                half = d // 2
                for i in range(half):
                    x0, x1 = v[i], v[i + half]
                    want[0, si, hi, i] = x0 * cos[si, i] - x1 * sin[si, i]
                    want[0, si, hi, i + half] = x0 * sin[si, i] + x1 * cos[si, i]
    assert nmse(got, want) < 1e-12


def test_swiglu_nmse():
    g = RNG.standard_normal((3, 32)).astype(np.float32)
    u = RNG.standard_normal((3, 32)).astype(np.float32)
    gf = g.astype(np.float64)
    want = gf / (1 + np.exp(-gf)) * u.astype(np.float64)
    got = swiglu(jnp.asarray(g), jnp.asarray(u))
    assert nmse(got, want) < 1e-12


def _attn_ref(q, k, v, pos, scale):
    """float64 attention reference with causal masking by position."""
    b, s, h, d = q.shape
    t, kvh = k.shape[1], k.shape[2]
    g = h // kvh
    out = np.zeros((b, s, h, d))
    for bi in range(b):
        for hi in range(h):
            kh = hi // g
            sc = (q[bi, :, hi].astype(np.float64) @
                  k[bi, :, kh].astype(np.float64).T) * scale  # (s, t)
            mask = np.arange(t)[None, :] > pos[bi][:, None]
            sc[mask] = -np.inf
            sc -= sc.max(-1, keepdims=True)
            p = np.exp(sc)
            p /= p.sum(-1, keepdims=True)
            out[bi, :, hi] = p @ v[bi, :, kh].astype(np.float64)
    return out


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_attention_nmse(impl):
    b, s, t, h, kvh, d = 1, 3, 32, 4, 2, 16
    q = RNG.standard_normal((b, s, h, d)).astype(np.float32)
    k = RNG.standard_normal((b, t, kvh, d)).astype(np.float32)
    v = RNG.standard_normal((b, t, kvh, d)).astype(np.float32)
    pos = np.arange(10, 10 + s, dtype=np.int32)[None]
    scale = 1.0 / np.sqrt(d)
    want = _attn_ref(q, k, v, pos, scale)
    if impl == "xla":
        got = gqa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            causal_mask(jnp.asarray(pos), t), scale)
    else:
        from prima_tpu.ops.attention_pallas import flash_attention

        got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(pos), scale)
    assert nmse(got, want) < 1e-10


@pytest.mark.parametrize("t", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                               GGMLType.Q5_1, GGMLType.Q8_0, GGMLType.Q2_K,
                               GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
                               GGMLType.Q6_K, GGMLType.IQ4_NL],
                         ids=lambda t: t.name)
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_qmatmul_nmse(t, impl):
    """Fused dequant-matmul vs f64 matmul on f64-dequantized weights.
    Tolerance mirrors test-quantize-fns' dot-product budget (<=0.02 rms)."""
    from prima_tpu.quant.device_format import to_device_format
    from prima_tpu.quant.dequant_jax import QTensor, qmatmul_xla
    from prima_tpu.quant.dequant_np import dequantize
    from prima_tpu.quant.pallas.qmatmul import qmatmul_pallas
    from prima_tpu.quant.quantize_np import quantize

    n, k = 32, 512
    w = (RNG.standard_normal((n, k)) * 0.05).astype(np.float32)
    try:
        raw = quantize(w, t)
    except NotImplementedError:
        pytest.skip(f"no quantizer for {t.name}")
    qt = QTensor.from_host(to_device_format(raw, t, k))
    x = RNG.standard_normal((2, k)).astype(np.float32)

    w_deq = dequantize(raw, t, k).astype(np.float64)
    want = x.astype(np.float64) @ w_deq.T
    fn = qmatmul_xla if impl == "xla" else qmatmul_pallas
    got = fn(jnp.asarray(x), qt)
    assert nmse(got, want) < 1e-9  # dequant is exact; only fp32 accum noise


def test_kv_quant_nmse():
    from prima_tpu.ops.kvquant import quantize_kv

    x = RNG.standard_normal((2, 16, 4, 64)).astype(np.float32)
    q, s = quantize_kv(jnp.asarray(x))
    got = np.asarray(q, dtype=np.float64) * np.asarray(s, dtype=np.float64)
    assert nmse(got, x.astype(np.float64)) < 1e-4  # int8 quantization noise


def test_embed_rows_nmse():
    from prima_tpu.quant.device_format import to_device_format
    from prima_tpu.quant.dequant_jax import QTensor, dequant_rows
    from prima_tpu.quant.dequant_np import dequantize
    from prima_tpu.quant.quantize_np import quantize

    n, k = 64, 256
    w = (RNG.standard_normal((n, k)) * 0.02).astype(np.float32)
    raw = quantize(w, GGMLType.Q4_K)
    qt = QTensor.from_host(to_device_format(raw, GGMLType.Q4_K, k))
    ids = np.asarray([[3, 60, 0], [7, 7, 63]], np.int32)
    got = dequant_rows(qt, jnp.asarray(ids), jnp.float32)
    want = dequantize(raw, GGMLType.Q4_K, k)[ids]
    assert nmse(got, want) < 1e-12


def test_yarn_freqs_match_hf():
    """YaRN NTK-by-parts: low (high-frequency) dims extrapolate at the
    ORIGINAL freq, high dims interpolate by 1/factor — regression for an
    inverted blend + double-halved correction dims."""
    transformers = pytest.importorskip("transformers")
    from transformers.modeling_rope_utils import _compute_yarn_parameters

    from prima_tpu.models.config import RopeScaling, tiny_config
    from prima_tpu.ops.layers import rope_freqs

    cfg = transformers.LlamaConfig(
        hidden_size=512, num_attention_heads=4, rope_theta=10000.0,
        max_position_embeddings=16384,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 4096,
                      "beta_fast": 32.0, "beta_slow": 1.0})
    inv_hf, _ = _compute_yarn_parameters(cfg, "cpu")
    c = tiny_config(n_embd=512, n_heads=4, head_dim=128, rope_dim=128,
                    rope_base=10000.0, n_ctx_train=16384)
    c.rope_scaling = RopeScaling(kind="yarn", factor=4.0, orig_ctx=4096,
                                 beta_fast=32.0, beta_slow=1.0,
                                 attn_factor=1.0)
    ours, _ = rope_freqs(c)
    np.testing.assert_allclose(np.asarray(ours), inv_hf.numpy(), rtol=1e-6)


# ---------------------------------------------------------------------------
# Expanded op x type sweep (test-backend-ops.cpp's coverage philosophy:
# every op on every backend path vs an independent high-precision reference)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("act", ["silu", "gelu", "relu2"])
def test_gated_act_nmse(act):
    from prima_tpu.ops.layers import gated_act

    g = RNG.standard_normal((3, 64)).astype(np.float32)
    u = RNG.standard_normal((3, 64)).astype(np.float32)
    gf, uf = g.astype(np.float64), u.astype(np.float64)
    if act == "silu":
        want = gf / (1 + np.exp(-gf)) * uf
        tol = 1e-12
    elif act == "gelu":
        # ggml tanh-approx gelu
        want = 0.5 * gf * (1 + np.tanh(
            np.sqrt(2 / np.pi) * (gf + 0.044715 * gf ** 3))) * uf
        tol = 1e-9
    else:
        r = np.maximum(gf, 0)
        want = r * r * uf
        tol = 1e-12
    got = gated_act(jnp.asarray(g), jnp.asarray(u), act)
    assert nmse(got, want) < tol


@pytest.mark.parametrize("with_bias", [True, False])
def test_layer_norm_nmse(with_bias):
    from prima_tpu.ops.layers import layer_norm

    x = RNG.standard_normal((2, 5, 48)).astype(np.float32)
    w = RNG.standard_normal(48).astype(np.float32)
    b = RNG.standard_normal(48).astype(np.float32) if with_bias else None
    eps = 1e-5
    xf = x.astype(np.float64)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    want = (xf - mu) / np.sqrt(var + eps) * w.astype(np.float64)
    if with_bias:
        want = want + b.astype(np.float64)
    got = layer_norm(jnp.asarray(x), jnp.asarray(w),
                     jnp.asarray(b) if with_bias else None, eps)
    assert nmse(got, want) < 1e-10


def test_alibi_attention_nmse():
    """ALiBi-biased attention vs an f64 reference with explicit -m*|i-j|."""
    from prima_tpu.ops.layers import alibi_mask, alibi_slopes

    b, s, t, h, d = 1, 2, 16, 8, 16
    q = RNG.standard_normal((b, s, h, d)).astype(np.float32)
    k = RNG.standard_normal((b, t, h, d)).astype(np.float32)
    v = RNG.standard_normal((b, t, h, d)).astype(np.float32)
    pos = np.asarray([[8, 9]], np.int32)
    scale = 1.0 / np.sqrt(d)
    slopes = alibi_slopes(h, 8.0)
    got = gqa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        alibi_mask(jnp.asarray(pos), t), scale,
                        slopes=jnp.asarray(slopes))

    out = np.zeros((b, s, h, d))
    for hi in range(h):
        sc = (q[0, :, hi].astype(np.float64) @ k[0, :, hi].astype(np.float64).T) * scale
        bias = -slopes[hi].astype(np.float64) * np.abs(
            pos[0][:, None].astype(np.float64) - np.arange(t)[None, :])
        sc = sc + bias
        sc[np.arange(t)[None, :] > pos[0][:, None]] = -np.inf
        sc -= sc.max(-1, keepdims=True)
        p = np.exp(sc)
        p /= p.sum(-1, keepdims=True)
        out[0, :, hi] = p @ v[0, :, hi].astype(np.float64)
    assert nmse(got, out) < 1e-10


def test_softcap_attention_nmse():
    """Gemma2-style attention logit softcapping: cap*tanh(score/cap)."""
    b, s, t, h, d = 1, 2, 8, 2, 16
    q = RNG.standard_normal((b, s, h, d)).astype(np.float32)
    k = RNG.standard_normal((b, t, h, d)).astype(np.float32)
    v = RNG.standard_normal((b, t, h, d)).astype(np.float32)
    pos = np.asarray([[6, 7]], np.int32)
    scale, cap = 0.25, 5.0
    got = gqa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        causal_mask(jnp.asarray(pos), t), scale,
                        logit_softcap=cap)

    out = np.zeros((b, s, h, d))
    for hi in range(h):
        sc = (q[0, :, hi].astype(np.float64) @ k[0, :, hi].astype(np.float64).T) * scale
        sc = cap * np.tanh(sc / cap)
        sc[np.arange(t)[None, :] > pos[0][:, None]] = -np.inf
        sc -= sc.max(-1, keepdims=True)
        p = np.exp(sc)
        p /= p.sum(-1, keepdims=True)
        out[0, :, hi] = p @ v[0, :, hi].astype(np.float64)
    assert nmse(got, out) < 1e-10


def test_swa_mask():
    """Sliding-window attention mask admits only the last `window` cells."""
    m = np.asarray(causal_mask(jnp.asarray([[10]], np.int32), 16,
                               swa_window=4))
    visible = np.isfinite(m[0, 0, 0]) & (m[0, 0, 0] == 0)
    want = np.zeros(16, bool)
    want[7:11] = True  # positions within the window of pos=10
    np.testing.assert_array_equal(visible, want)


@pytest.mark.parametrize("t", [GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q8_0,
                               GGMLType.IQ4_XS],
                         ids=lambda t: t.name)
@pytest.mark.parametrize("shape", [(8, 256, 1), (64, 1024, 7), (16, 512, 16)],
                         ids=["tiny", "oddbatch", "gemm"])
def test_qmatmul_shape_sweep(t, shape):
    """Shape x type sweep incl. GEMM-width batches and non-multiple-of-8
    batch sizes (the padding path)."""
    from prima_tpu.quant.device_format import to_device_format
    from prima_tpu.quant.dequant_jax import QTensor, qmatmul_xla
    from prima_tpu.quant.dequant_np import dequantize
    from prima_tpu.quant.pallas.qmatmul import qmatmul_pallas
    from prima_tpu.quant.quantize_np import quantize

    n, k, b = shape
    w = (RNG.standard_normal((n, k)) * 0.05).astype(np.float32)
    raw = quantize(w, t)
    qt = QTensor.from_host(to_device_format(raw, t, k))
    x = RNG.standard_normal((b, k)).astype(np.float32)
    w_deq = dequantize(raw, t, k).astype(np.float64)
    want = x.astype(np.float64) @ w_deq.T
    for fn in (qmatmul_xla, qmatmul_pallas):
        got = fn(jnp.asarray(x), qt)
        assert nmse(got, want) < 1e-9, fn.__name__


def test_kv_quant_int4_nmse():
    from prima_tpu.ops.kvquant import quantize_kv4

    x = RNG.standard_normal((2, 16, 4, 64)).astype(np.float32)
    q, s = quantize_kv4(jnp.asarray(x))
    # split-halves packing with +8 offset: lo nibble = d[:D/2], hi = d[D/2:]
    qb = np.asarray(q).astype(np.uint8)
    lo = (qb & 0x0F).astype(np.int32) - 8
    hi = (qb >> 4).astype(np.int32) - 8
    deq = np.concatenate([lo, hi], axis=-1).astype(np.float64)
    got = deq * np.asarray(s, np.float64)
    assert nmse(got, x.astype(np.float64)) < 5e-2  # int4 noise


def test_rope_yarn_mscale_applied():
    """YaRN attention magnitude scale multiplies cos/sin."""
    b, s, h, d = 1, 2, 1, 8
    x = RNG.standard_normal((b, s, h, d)).astype(np.float32)
    pos = np.asarray([[5, 6]], np.int32)
    inv = (1.0 / 10000.0 ** (np.arange(0, d // 2) * 2.0 / d)).astype(np.float32)
    base = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos),
                                 jnp.asarray(inv), RopeType.NEOX, 1.0))
    scaled = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos),
                                   jnp.asarray(inv), RopeType.NEOX, 1.25))
    np.testing.assert_allclose(scaled, base * 1.25, rtol=1e-5, atol=1e-6)


def test_rope_overrides_and_ext_factor():
    """CLI RoPE overrides (--rope-scaling/--rope-freq-*/--yarn-*,
    common/arg.cpp) and the ggml rope_yarn ext_factor semantics:
    ext_factor=0 degrades YaRN to pure interpolation with no magnitude
    correction (ggml.c:14094-14109)."""
    from prima_tpu.models.config import (RopeScaling, apply_rope_overrides,
                                         tiny_config)
    from prima_tpu.ops.layers import rope_freqs

    c = tiny_config(n_embd=512, n_heads=4, head_dim=128, rope_dim=128,
                    rope_base=10000.0, n_ctx_train=16384)
    # --rope-freq-scale 0.25 => linear factor 4
    apply_rope_overrides(c, rope_freq_scale=0.25)
    assert c.rope_scaling.kind == "linear"
    assert c.rope_scaling.factor == pytest.approx(4.0)
    # --rope-freq-base overrides the GGUF base
    apply_rope_overrides(c, rope_freq_base=500000.0)
    assert c.rope_base == 500000.0
    # --rope-scaling yarn + --yarn-* flags land in the scaling params
    apply_rope_overrides(c, rope_scaling="yarn", yarn_orig_ctx=4096,
                         yarn_beta_fast=16.0, yarn_attn_factor=1.5)
    s = c.rope_scaling
    assert (s.kind, s.orig_ctx, s.beta_fast, s.attn_factor) == \
        ("yarn", 4096, 16.0, 1.5)

    # ext_factor=0: yarn freqs == linear freqs, mscale == attn_factor
    c2 = tiny_config(n_embd=512, n_heads=4, head_dim=128, rope_dim=128,
                     rope_base=10000.0, n_ctx_train=16384)
    c2.rope_scaling = RopeScaling(kind="yarn", factor=4.0, orig_ctx=4096,
                                  ext_factor=0.0, attn_factor=1.25)
    yarn0, mscale0 = rope_freqs(c2)
    c2.rope_scaling = RopeScaling(kind="linear", factor=4.0)
    lin, _ = rope_freqs(c2)
    np.testing.assert_allclose(np.asarray(yarn0), np.asarray(lin), rtol=1e-7)
    assert mscale0 == pytest.approx(1.25)
    # default (-1 = auto -> 1.0): the blend differs from linear and the
    # magnitude correction applies
    c2.rope_scaling = RopeScaling(kind="yarn", factor=4.0, orig_ctx=4096,
                                  attn_factor=1.25)
    yarn1, mscale1 = rope_freqs(c2)
    assert not np.allclose(np.asarray(yarn1), np.asarray(lin))
    assert mscale1 == pytest.approx(1.25 * (1.0 + 0.1 * np.log(4.0)))
