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
