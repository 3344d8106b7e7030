"""GGUF container round-trip tests (writer -> reader) and reference parity.

The reference oracle's gguf_init_from_file (ggml/src/ggml.c:22099) is used
to verify our writer emits containers the reference can parse.
"""

import ctypes
import os

import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType, GGUFValueType, Keys
from prima_tpu.gguf.reader import GGUFModel, GGUFReader
from prima_tpu.gguf.writer import GGUFWriter
from prima_tpu.quant.quantize_np import quantize


def _write_sample(path):
    w = GGUFWriter(str(path), arch="llama")
    w.add_kv("general.name", "test-model")
    w.add_kv("llama.block_count", 2)
    w.add_kv("llama.embedding_length", 64)
    w.add_kv("llama.attention.head_count", 4)
    w.add_kv("llama.rope.freq_base", 10000.0)
    w.add_kv("some.bool", True)
    w.add_kv("some.negative", -3)
    w.add_kv("tokenizer.ggml.tokens", ["<s>", "</s>", "hello", "▁world"])
    w.add_kv("tokenizer.ggml.scores", np.array([0.0, -1.0, -2.0, -3.5], dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array([3, 3, 1, 1], dtype=np.int32))

    rng = np.random.default_rng(3)
    f32 = rng.standard_normal((8, 64)).astype(np.float32)
    w.add_tensor("tok_embd.weight", f32)
    f16 = rng.standard_normal((4, 64)).astype(np.float16)
    w.add_tensor("output_norm.weight", f16)
    q = rng.standard_normal((16, 256)).astype(np.float32)
    raw = quantize(q, GGMLType.Q4_K)
    w.add_tensor("blk.0.attn_q.weight", raw, ne=(256, 16), ggml_type=GGMLType.Q4_K)
    w.write()
    return f32, f16, q, raw


def test_roundtrip(tmp_path):
    path = tmp_path / "sample.gguf"
    f32, f16, q, raw = _write_sample(path)

    r = GGUFReader(path)
    assert r.version == 3
    assert r.metadata[Keys.General.ARCHITECTURE] == "llama"
    assert r.metadata["llama.block_count"] == 2
    assert r.metadata["some.bool"] is True
    assert r.metadata["some.negative"] == -3
    assert abs(r.metadata["llama.rope.freq_base"] - 10000.0) < 1e-6
    assert r.metadata["tokenizer.ggml.tokens"] == ["<s>", "</s>", "hello", "▁world"]
    np.testing.assert_array_equal(
        r.metadata["tokenizer.ggml.scores"], np.array([0.0, -1.0, -2.0, -3.5], dtype=np.float32)
    )

    t = r.tensors["tok_embd.weight"]
    assert t.ggml_type == GGMLType.F32
    assert t.ne == (64, 8)
    assert t.shape == (8, 64)
    np.testing.assert_array_equal(np.asarray(t.data), f32)

    t16 = r.tensors["output_norm.weight"]
    np.testing.assert_array_equal(np.asarray(t16.data), f16)

    tq = r.tensors["blk.0.attn_q.weight"]
    assert tq.ggml_type == GGMLType.Q4_K
    assert tq.data.shape == (16, 144)
    np.testing.assert_array_equal(tq.data, raw)
    r.close()


def test_dequantize_tensor(tmp_path):
    path = tmp_path / "sample.gguf"
    *_, q, raw = _write_sample(path)
    from prima_tpu.quant.dequant_np import dequantize, dequantize_tensor

    with GGUFReader(path) as r:
        got = dequantize_tensor(r.tensors["blk.0.attn_q.weight"])
    want = dequantize(raw, GGMLType.Q4_K, 256)
    np.testing.assert_array_equal(got, want)
    assert got.shape == (16, 256)


def test_ggufmodel_single(tmp_path):
    path = tmp_path / "sample.gguf"
    _write_sample(path)
    m = GGUFModel.open(path)
    assert m.arch == "llama"
    assert m.arch_key("{arch}.block_count") == 2
    assert len(m.tensors) == 3
    m.close()


@pytest.mark.skipif(
    not os.path.exists("/tmp/prima_oracle/libggml_oracle.so"),
    reason="reference oracle not built",
)
def test_reference_can_parse_our_gguf(tmp_path):
    """The reference gguf parser accepts containers produced by our writer."""
    path = tmp_path / "sample.gguf"
    _write_sample(path)
    lib = ctypes.CDLL("/tmp/prima_oracle/libggml_oracle.so")

    class InitParams(ctypes.Structure):
        _fields_ = [("no_alloc", ctypes.c_bool), ("ctx", ctypes.c_void_p)]

    lib.gguf_init_from_file.restype = ctypes.c_void_p
    lib.gguf_init_from_file.argtypes = [ctypes.c_char_p, InitParams]
    ctx = lib.gguf_init_from_file(str(path).encode(), InitParams(True, None))
    assert ctx, "reference failed to parse our GGUF"
    lib.gguf_get_n_tensors.restype = ctypes.c_int64
    lib.gguf_get_n_tensors.argtypes = [ctypes.c_void_p]
    assert lib.gguf_get_n_tensors(ctx) == 3
    lib.gguf_get_n_kv.restype = ctypes.c_int64
    lib.gguf_get_n_kv.argtypes = [ctypes.c_void_p]
    assert lib.gguf_get_n_kv(ctx) == 11  # 10 added + general.architecture
    lib.gguf_free.argtypes = [ctypes.c_void_p]
    lib.gguf_free(ctx)
