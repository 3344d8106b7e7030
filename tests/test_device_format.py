"""Uniform device layout preserves bit-exact dequantization.

For every format: golden raw bytes -> UQTensor -> dequant must equal the
reference oracle's output bit-for-bit, on both the numpy and the XLA path.
"""

import os

import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.quant.device_format import SUPPORTED_TYPES, dequant_uq_np, to_device_format

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

TYPES = sorted(SUPPORTED_TYPES, key=int)


def _golden(t):
    g = np.load(os.path.join(GOLDEN_DIR, f"dequant_{t.name.lower()}.npz"))
    return g["raw"], g["expected"], int(g["n_per_row"])


@pytest.mark.parametrize("t", TYPES, ids=lambda t: t.name)
def test_uq_roundtrip_bitexact(t):
    raw, expected, n = _golden(t)
    uq = to_device_format(raw, t, n)
    got = dequant_uq_np(uq)
    assert np.array_equal(got, expected.reshape(got.shape)), f"{t.name}: UQ dequant differs"


@pytest.mark.parametrize("t", TYPES, ids=lambda t: t.name)
def test_uq_multirow(t):
    """Multi-row tensors convert row-independently."""
    raw, expected, n = _golden(t)
    k = n // 4
    raw4 = raw.reshape(4, -1)
    uq = to_device_format(raw4, t, k)
    assert uq.shape == (4, k)
    got = dequant_uq_np(uq)
    assert np.array_equal(got, expected.reshape(4, k))


@pytest.mark.parametrize("t", TYPES, ids=lambda t: t.name)
def test_uq_jax_dequant_bitexact(t):
    """XLA dequant (CPU backend) matches the oracle bit-for-bit."""
    from prima_tpu.quant.dequant_jax import QTensor, dequant

    raw, expected, n = _golden(t)
    k = n // 4
    uq = to_device_format(raw.reshape(4, -1), t, k)
    qt = QTensor.from_host(uq)
    got = np.asarray(dequant(qt))
    assert np.array_equal(got, expected.reshape(4, k)), f"{t.name}: XLA dequant differs"


def test_qmatmul_xla_matches_dense():
    from prima_tpu.quant.dequant_jax import QTensor, qmatmul_xla

    t = GGMLType.Q4_K
    raw, expected, n = _golden(t)
    k = n // 4
    uq = to_device_format(raw.reshape(4, -1), t, k)
    qt = QTensor.from_host(uq)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, k)).astype(np.float32)
    got = np.asarray(qmatmul_xla(x, qt))
    want = x @ expected.reshape(4, k).T
    # f32 accumulation order differs between XLA and numpy at k=4096
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=0.1)
