"""Bit-exactness of numpy dequantization vs reference goldens.

Fixtures in tests/golden/ were produced by the actual reference
dequantize_row_* implementations (see tests/tools/gen_golden.py); every
supported format must match bit-for-bit. This is stricter than the
reference's own error-budget tests (tests/test-quantize-fns.cpp:16-24).
"""

import os

import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.quant.dequant_np import dequantize

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

DEQ_TYPES = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
    GGMLType.IQ2_XXS,
    GGMLType.IQ2_XS,
    GGMLType.IQ2_S,
    GGMLType.IQ3_XXS,
    GGMLType.IQ3_S,
    GGMLType.IQ1_S,
    GGMLType.IQ1_M,
    GGMLType.TQ1_0,
    GGMLType.TQ2_0,
]


@pytest.mark.parametrize("t", DEQ_TYPES, ids=lambda t: t.name)
def test_dequant_bitexact(t):
    path = os.path.join(GOLDEN_DIR, f"dequant_{t.name.lower()}.npz")
    g = np.load(path)
    raw, expected, n = g["raw"], g["expected"], int(g["n_per_row"])
    got = dequantize(raw, t, n)
    assert got.dtype == np.float32
    exact = np.array_equal(got, expected)
    if not exact:
        bad = np.flatnonzero(got.ravel() != expected.ravel())
        i = bad[0]
        raise AssertionError(
            f"{t.name}: {bad.size}/{expected.size} mismatches; first at {i}: "
            f"got {got.ravel()[i]!r} want {expected.ravel()[i]!r}"
        )


@pytest.mark.parametrize("t", [GGMLType.Q4_0, GGMLType.Q8_0,
                               GGMLType.TQ1_0, GGMLType.TQ2_0],
                         ids=lambda t: t.name)
def test_quantize_bitexact_legacy(t):
    """Imatrix-free encoders match reference quantize_row_*_ref byte-for-byte."""
    from prima_tpu.quant.quantize_np import quantize

    path = os.path.join(GOLDEN_DIR, f"quantize_{t.name.lower()}.npz")
    g = np.load(path)
    x, expected = g["x"], g["expected"]
    got = quantize(x, t)
    assert np.array_equal(got, expected), f"{t.name}: encoder differs from reference"


@pytest.mark.parametrize(
    "t,max_rel_rmse",
    [
        # regression fences ~25% above measured RTN error on N(0,1) data
        (GGMLType.Q2_K, 0.40),
        (GGMLType.Q3_K, 0.23),
        (GGMLType.Q4_K, 0.10),
        (GGMLType.Q5_K, 0.05),
        (GGMLType.Q6_K, 0.025),
        (GGMLType.Q4_1, 0.10),
        (GGMLType.Q5_0, 0.055),
        (GGMLType.Q5_1, 0.05),
        (GGMLType.IQ4_NL, 0.10),
    ],
    ids=lambda v: v.name if isinstance(v, GGMLType) else str(v),
)
def test_quantize_roundtrip_error(t, max_rel_rmse):
    """RTN encoders stay within sane round-trip error (reference's
    test-quantize-fns pattern with per-format thresholds)."""
    from prima_tpu.quant.quantize_np import quantize

    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 1024)).astype(np.float32)
    enc = quantize(x, t)
    dec = dequantize(enc, t, 1024)
    rel = np.sqrt(np.mean((dec - x) ** 2)) / np.sqrt(np.mean(x**2))
    assert rel < max_rel_rmse, f"{t.name}: rel RMSE {rel:.5f} >= {max_rel_rmse}"


def test_dequant_all_types_cover_traits():
    """Every format we claim in DEQUANT_FNS decodes the right element count."""
    from prima_tpu.gguf.constants import TYPE_TRAITS
    from prima_tpu.quant.dequant_np import DEQUANT_FNS

    rng = np.random.default_rng(0)
    for t, fn in DEQUANT_FNS.items():
        tt = TYPE_TRAITS[t]
        n = tt.block_size * 2
        raw = rng.integers(0, 255, size=(3, 2 * tt.type_size), dtype=np.uint16).astype(np.uint8)
        out = fn(raw, n)
        assert out.shape == (3, n), t.name
