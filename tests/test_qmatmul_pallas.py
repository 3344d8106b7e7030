"""Pallas fused dequant-matmul vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.quant.device_format import to_device_format
from prima_tpu.quant.dequant_jax import QTensor, qmatmul_xla
from prima_tpu.quant.pallas.qmatmul import qmatmul_pallas
from prima_tpu.quant.quantize_np import quantize

N, K = 64, 512


def _qt(t: GGMLType, n=N, k=K, seed=0) -> QTensor:
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    raw = quantize(x, t)
    return QTensor.from_host(to_device_format(raw, t, k))


@pytest.mark.parametrize(
    "t", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0],
    ids=lambda t: t.name,
)
@pytest.mark.parametrize("b", [1, 4])
def test_pallas_matches_xla(t, b):
    qt = _qt(t)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, K)).astype(np.float32))
    want = np.asarray(qmatmul_xla(x, qt))
    got = np.asarray(qmatmul_pallas(x, qt))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_3d_input():
    qt = _qt(GGMLType.Q4_K)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3, K)).astype(np.float32))
    want = np.asarray(qmatmul_xla(x, qt))
    got = np.asarray(qmatmul_pallas(x, qt))
    assert got.shape == (2, 3, N)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fallback_odd_shapes():
    qt = _qt(GGMLType.Q4_0, n=12, k=160)  # K not 256-divisible -> XLA fallback
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 160)).astype(np.float32))
    got = np.asarray(qmatmul_pallas(x, qt))
    want = np.asarray(qmatmul_xla(x, qt))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


IQ_TYPES = [GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
            GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
            GGMLType.IQ4_NL, GGMLType.IQ4_XS]


@pytest.mark.parametrize("t", IQ_TYPES, ids=lambda t: t.name)
def test_pallas_iq_matches_xla(t):
    """IQ codebook formats through the fused kernel (golden raw blocks —
    there is no synthetic encoder for these)."""
    import os

    golden = os.path.join(os.path.dirname(__file__), "golden",
                          f"dequant_{t.name.lower()}.npz")
    g = np.load(golden)
    raw, n = g["raw"], int(g["n_per_row"])
    k = n // 8  # 8 rows: the minimum pallas-eligible row count
    qt = QTensor.from_host(to_device_format(raw.reshape(n // k, -1), t, k))
    assert qt.kperm, f"{t.name} should be pallas-eligible at {(n // k, k)}"
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, k)).astype(np.float32))
    want = np.asarray(qmatmul_xla(x, qt))
    got = np.asarray(qmatmul_pallas(x, qt))
    # golden raw blocks carry adversarial random scales (|w| up to ~1e3),
    # so the f32 accumulation-order difference between the XLA dot and the
    # kernel's K-tiling is visible; bound error by the summation magnitude
    # sum_k |x||w| (~9 ulps for a 512-term tree sum) instead of rtol on the
    # possibly-cancelled result.
    from prima_tpu.quant.dequant_jax import dequant

    denom = np.abs(np.asarray(x)) @ np.abs(np.asarray(dequant(qt))).T
    err = np.abs(got - want)
    assert (err <= 4e-6 * denom + 1e-5).all(), (
        f"{t.name}: max err {err.max()} vs bound {(4e-6 * denom).max()}"
    )
