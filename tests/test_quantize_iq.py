"""IQ-family encoders: wire-format validity + weighted-error quality.

The encoders are search procedures (not bit-specified), so the tests check
(1) our decoder round-trips the bytes, (2) the REFERENCE implementation
decodes the same bytes to the same values (format validity), and (3) the
weighted error is within the reference encoder's error budget."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.quant.dequant_np import dequantize
from prima_tpu.quant.quantize_iq import (quantize_iq1_m, quantize_iq1_s,
                                         quantize_iq2_s, quantize_iq2_xs,
                                         quantize_iq2_xxs, quantize_iq3_s,
                                         quantize_iq3_xxs)

CASES = [
    (quantize_iq2_xxs, GGMLType.IQ2_XXS, "iq2_xxs"),
    (quantize_iq2_xs, GGMLType.IQ2_XS, "iq2_xs"),
    (quantize_iq2_s, GGMLType.IQ2_S, "iq2_s"),
    (quantize_iq3_xxs, GGMLType.IQ3_XXS, "iq3_xxs"),
    (quantize_iq3_s, GGMLType.IQ3_S, "iq3_s"),
    (quantize_iq1_s, GGMLType.IQ1_S, "iq1_s"),
    (quantize_iq1_m, GGMLType.IQ1_M, "iq1_m"),
]

N = 1024


def _data(seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((4, N)) * 0.05).astype(np.float32)
    qw = (np.abs(rng.standard_normal(N)) + 0.1).astype(np.float32)
    return x, qw


@pytest.mark.parametrize("fn,t,_c", CASES, ids=lambda c: getattr(c, "name", ""))
def test_roundtrip_quality(fn, t, _c):
    x, qw = _data()
    raw = fn(x, qw)
    from prima_tpu.gguf.constants import TYPE_TRAITS

    assert raw.shape == (4, N // 256 * TYPE_TRAITS[t].type_size)
    y = dequantize(raw, t, N)
    # cosine similarity budgets per bit-width (2-bit ~0.93+, 3-bit ~0.97+)
    cos = float((x * y).sum() / np.sqrt((x * x).sum() * (y * y).sum()))
    floor = 0.96 if "IQ3" in t.name else (0.85 if "IQ1" in t.name else 0.90)
    assert cos > floor, f"{t.name}: cos={cos}"
    # unweighted path (default sigma weights) also valid
    y2 = dequantize(fn(x), t, N)
    assert np.isfinite(y2).all()


@pytest.mark.parametrize("fn,t,cname", CASES, ids=lambda c: getattr(c, "name", ""))
@pytest.mark.skipif(not os.path.exists("/root/reference/ggml/src/ggml-quants.c"),
                    reason="reference tree unavailable")
def test_wire_format_matches_reference(fn, t, cname):
    """Bytes we emit must decode IDENTICALLY through the reference decoder,
    and our weighted error must not exceed the reference encoder's."""
    import ctypes
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    from build_oracle import load

    lib = load()
    lib.ggml_quantize_init.argtypes = [ctypes.c_int]
    lib.ggml_quantize_init(int(t))

    x, qw = _data()
    raw = np.ascontiguousarray(fn(x, qw))
    out = np.zeros(x.size, np.float32)
    deq = getattr(lib, f"dequantize_row_{cname}")
    deq.restype = None
    deq(raw.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(x.size))
    ours = dequantize(raw, t, N).ravel()
    np.testing.assert_array_equal(out, ours)

    qfn = getattr(lib, f"quantize_{cname}")
    qfn.restype = ctypes.c_size_t
    ref_raw = np.zeros_like(raw)
    qwb = np.ascontiguousarray(np.broadcast_to(qw, x.shape))
    qfn(x.ctypes.data_as(ctypes.c_void_p),
        ref_raw.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(x.shape[0]), ctypes.c_int64(N),
        qwb.ctypes.data_as(ctypes.c_void_p))
    ref_y = dequantize(ref_raw, t, N)
    y = dequantize(raw, t, N)

    def werr(yy):
        return float((qwb * (yy - x) ** 2).sum())

    assert werr(y) <= werr(ref_y) * 1.05, \
        f"{t.name}: ours {werr(y)} vs reference {werr(ref_y)}"


def test_quantize_gguf_iq_ftype(tmp_path):
    """tools/quantize end-to-end with an IQ ftype + the model still runs."""
    from prima_tpu.models.llama import ForwardOptions
    from prima_tpu.models.loader import load_model
    from prima_tpu.runtime.engine import Engine
    from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf
    from prima_tpu.tools.quantize import quantize_gguf
    from prima_tpu.gguf.reader import GGUFModel

    src = str(tmp_path / "tiny.gguf")
    make_tiny_gguf(src, seed=3)
    dst = str(tmp_path / "iq2.gguf")
    quantize_gguf(src, dst, "IQ2_XS", logfile=open(os.devnull, "w"))
    m = GGUFModel.open(dst)
    assert m.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.IQ2_XS
    assert m.tensors["output.weight"].ggml_type == GGMLType.Q5_K
    m.close()
    lm = load_model(dst)
    eng = Engine(lm.cfg, lm.params, n_slots=1, max_seq=64,

                 opts=ForwardOptions(matmul_impl="xla"))
    out = eng.run_to_completion([3, 5, 7], n_predict=4)
    assert len(out) == 4
