"""Native C++ converter vs the numpy reference — bit-exact, both orders."""

import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.native import get_lib, native_convert
from prima_tpu.quant.device_format import to_device_format, unpack_nib4
from prima_tpu.quant.dequant_jax import host_pack
from prima_tpu.quant.quantize_np import quantize

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")

ROWS, K = 24, 512


def _raw(t, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((ROWS, K)) * 0.07).astype(np.float32)
    return quantize(x, t)


@pytest.mark.parametrize("t", [GGMLType.Q4_K, GGMLType.Q4_0, GGMLType.Q6_K, GGMLType.Q8_0],
                         ids=lambda t: t.name)
@pytest.mark.parametrize("kperm", [False, True], ids=["natural", "kperm"])
def test_native_matches_numpy(t, kperm):
    raw = _raw(t)
    uq = to_device_format(raw, t, K)
    if kperm:
        qs_ref, sc_ref, mn_ref, d_ref, dmin_ref, did, packed = host_pack(uq, pallas=True)
        assert did
    else:
        qs_ref, sc_ref, mn_ref = uq.qs, uq.scales, uq.mins
        d_ref, dmin_ref, packed = uq.d, uq.dmin, False
    got = native_convert(raw, t, K, kperm, packed)
    assert got is not None
    qs_n, sc_n, mn_n, d_n, dmin_n = got

    np.testing.assert_array_equal(qs_n, qs_ref)
    np.testing.assert_array_equal(np.asarray(sc_n).view(np.uint8),
                                  np.asarray(sc_ref).view(np.uint8))
    if mn_n is not None:
        np.testing.assert_array_equal(np.asarray(mn_n).view(np.uint8),
                                      np.asarray(mn_ref).view(np.uint8))
    else:
        assert mn_ref is None
    if d_n is not None:
        np.testing.assert_array_equal(np.asarray(d_n).view(np.uint8),
                                      np.asarray(d_ref).view(np.uint8))
    else:
        assert d_ref is None
    if dmin_n is not None:
        np.testing.assert_array_equal(dmin_n, dmin_ref)
    else:
        assert dmin_ref is None


def test_native_faster_than_numpy():
    """Sanity: native should not be slower on a moderately sized tensor."""
    import time

    t = GGMLType.Q4_K
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1024, 2048)) * 0.05).astype(np.float32)
    raw = quantize(x, t)
    t0 = time.perf_counter()
    native_convert(raw, t, 2048, True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    uq = to_device_format(raw, t, 2048)
    host_pack(uq, pallas=True)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy * 3  # loose: CI boxes vary wildly


def test_native_tokenizer_matches_python():
    """The C++ SPM/BPE hot paths produce EXACTLY the Python reference
    implementation's ids on the reference vocab fixtures (which are
    themselves golden-tested against the reference's test vectors)."""
    import os

    from prima_tpu.gguf.reader import GGUFModel
    from prima_tpu.native import get_lib
    from prima_tpu.tokenizer import Tokenizer
    from prima_tpu.tokenizer import native as tok_native

    if get_lib() is None:
        pytest.skip("no native compiler available")
    texts = [
        "Hello world", " Hello world!  \n", "ied 4 ½ months",
        "你好，世界！ café \U0001f600\U0001f62e‍\U0001f4a8",
        "   leading spaces", "tab\tnewline\n mix 123 456.789",
        "a" * 300, ("word " * 50).strip(),
    ]
    for name in ("ggml-vocab-llama-spm", "ggml-vocab-gpt-2",
                 "ggml-vocab-deepseek-llm"):
        path = f"/root/reference/models/{name}.gguf"
        if not os.path.exists(path):
            pytest.skip(f"fixture {path} not present")
        m = GGUFModel.open(path)
        tok = Tokenizer.from_gguf(m)
        v = tok.vocab
        assert tok_native.get(v) is not None
        for text in texts:
            got = tok.encode(text, add_special=False)
            object.__setattr__(v, "_native_tok", None)  # force Python path
            want = tok.encode(text, add_special=False)
            object.__setattr__(v, "_native_tok", False)  # re-enable native
            assert got == want, (name, text)
        m.close()
