"""Generate golden dequantization fixtures from the reference oracle.

For each quantized type we create deterministic pseudo-random block bytes
(with finite f16 scale fields), run the reference dequantize_row_* through
ctypes, and store {raw bytes, expected f32 output} in tests/golden/*.npz.
Also stores quantize_row_* golden encodings for the legacy formats whose
encoders we claim bit-exact.

Run: python tests/tools/gen_golden.py
"""

from __future__ import annotations

import ctypes
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from prima_tpu.gguf.constants import GGMLType, TYPE_TRAITS  # noqa: E402
from tests.tools.build_oracle import load  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "golden")

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
    GGMLType.IQ1_S,
    GGMLType.IQ1_M,
    # appended after the first fixture generation: keep at the END so the
    # shared rng stream (and thus the existing fixtures) is unchanged
    GGMLType.IQ2_XS,
    GGMLType.IQ2_S,
    GGMLType.IQ3_XXS,
    GGMLType.IQ3_S,
    GGMLType.TQ1_0,
    GGMLType.TQ2_0,
]

QUANT_EXACT_TYPES = [
    GGMLType.Q4_0,
    GGMLType.Q8_0,
    # ternary encoders are imatrix-free and deterministic -> bit-exact
    GGMLType.TQ1_0,
    GGMLType.TQ2_0,
]

# byte offsets of f16 scale fields that must be finite for a fair comparison
F16_FIELDS = {
    GGMLType.Q4_0: [0],
    GGMLType.Q4_1: [0, 2],
    GGMLType.Q5_0: [0],
    GGMLType.Q5_1: [0, 2],
    GGMLType.Q8_0: [0],
    GGMLType.Q2_K: [80, 82],
    GGMLType.Q3_K: [108],
    GGMLType.Q4_K: [0, 2],
    GGMLType.Q5_K: [0, 2],
    GGMLType.Q6_K: [208],
    GGMLType.IQ4_NL: [0],
    GGMLType.IQ4_XS: [0],
    GGMLType.IQ2_XXS: [0],
    GGMLType.IQ1_S: [0],
    GGMLType.IQ1_M: [],  # scale is spread across nibbles, any bits are valid f16 pieces
    GGMLType.IQ2_XS: [0],
    GGMLType.IQ2_S: [0],
    GGMLType.IQ3_XXS: [0],
    GGMLType.IQ3_S: [0],
    GGMLType.TQ1_0: [52],
    GGMLType.TQ2_0: [64],
}


def random_blocks(rng: np.random.Generator, t: GGMLType, n_blocks: int) -> np.ndarray:
    tt = TYPE_TRAITS[t]
    raw = rng.integers(0, 256, size=(n_blocks, tt.type_size), dtype=np.uint16).astype(np.uint8)
    scales = rng.uniform(-2.0, 2.0, size=(n_blocks, len(F16_FIELDS[t]))).astype(np.float16)
    sb = scales.view(np.uint8).reshape(n_blocks, -1, 2)
    for i, off in enumerate(F16_FIELDS[t]):
        raw[:, off : off + 2] = sb[:, i]
    if t == GGMLType.IQ1_M:
        # the block scale f16 is spread across the high nibbles of the four
        # u16 scale words (ggml-quants.c:3698); redraw until it's finite
        for _ in range(64):
            sc = raw[:, 48:56].copy().view(np.uint16).astype(np.uint32)
            u16 = (
                (sc[:, 0] >> 12)
                | ((sc[:, 1] >> 8) & 0x00F0)
                | ((sc[:, 2] >> 4) & 0x0F00)
                | (sc[:, 3] & 0xF000)
            ).astype(np.uint16)
            bad = ~np.isfinite(u16.view(np.float16))
            if not bad.any():
                break
            raw[bad, 48:56] = rng.integers(0, 256, size=(int(bad.sum()), 8), dtype=np.uint16).astype(np.uint8)
    return raw


def main() -> None:
    lib = load()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    rng = np.random.default_rng(42)
    n_super = 64  # blocks per fixture

    for t in DEQ_TYPES:
        tt = TYPE_TRAITS[t]
        raw = random_blocks(rng, t, n_super)
        n_elems = n_super * tt.block_size
        out = np.zeros(n_elems, dtype=np.float32)
        cname = re.sub(r"_k$", "_K", t.name.lower())
        fn = getattr(lib, f"dequantize_row_{cname}")
        fn.restype = None
        fn(
            raw.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(n_elems),
        )
        assert np.isfinite(out).all(), f"{t.name}: oracle produced non-finite values"
        np.savez(
            os.path.join(GOLDEN_DIR, f"dequant_{t.name.lower()}.npz"),
            raw=raw.reshape(1, -1),
            expected=out.reshape(1, -1),
            n_per_row=np.int64(n_elems),
        )
        print(f"dequant golden {t.name}: {n_elems} elems")

    # quantize goldens: same synthetic data as test-quantize-fns (cos ramp)
    for t in QUANT_EXACT_TYPES:
        tt = TYPE_TRAITS[t]
        n = 64 * tt.block_size
        x = (0.1 + 2.0 * np.cos(0.1 * np.arange(n, dtype=np.float32) + 1.0)).astype(np.float32)
        row_bytes = n // tt.block_size * tt.type_size
        enc = np.zeros(row_bytes, dtype=np.uint8)
        cname = re.sub(r"_k$", "_K", t.name.lower())
        fn = getattr(lib, f"quantize_row_{cname}_ref")
        fn.restype = None
        fn(
            x.ctypes.data_as(ctypes.c_void_p),
            enc.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(n),
        )
        np.savez(
            os.path.join(GOLDEN_DIR, f"quantize_{t.name.lower()}.npz"),
            x=x.reshape(1, -1),
            expected=enc.reshape(1, -1),
        )
        print(f"quantize golden {t.name}: {n} elems")


if __name__ == "__main__":
    main()
