"""Tool round-trips: quantize, gguf-split, perplexity."""

import math
import os

import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.gguf.reader import GGUFModel
from prima_tpu.tools.gguf_split import merge_gguf, split_gguf
from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf
from prima_tpu.tools.quantize import quantize_gguf


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    return make_tiny_gguf(path, seed=3)


def test_quantize_roundtrip(tiny, tmp_path):
    dst = str(tmp_path / "q8.gguf")
    stats = quantize_gguf(tiny, dst, "Q8_0", logfile=open(os.devnull, "w"))
    assert stats["n_tensors"] > 0
    m = GGUFModel.open(dst)
    # weights are Q8_0 now; norms stayed f32
    assert m.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q8_0
    assert m.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
    assert m.tensors["output.weight"].ggml_type == GGMLType.Q8_0
    # requantized model still loads and runs
    from prima_tpu.models.loader import load_model
    from prima_tpu.runtime.engine import Engine
    from prima_tpu.models.llama import ForwardOptions

    lm = load_model(dst)
    eng = Engine(lm.cfg, lm.params, n_slots=1, max_seq=64,
                 opts=ForwardOptions(matmul_impl="xla"))
    out = eng.run_to_completion([3, 5, 7], n_predict=4)
    assert len(out) == 4


def test_quantize_q4km_rules(tiny, tmp_path):
    dst = str(tmp_path / "q4km.gguf")
    quantize_gguf(tiny, dst, "Q4_K_M", logfile=open(os.devnull, "w"))
    m = GGUFModel.open(dst)
    assert m.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q4_K
    assert m.tensors["blk.0.attn_v.weight"].ggml_type == GGMLType.Q6_K  # bumped
    assert m.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q6_K
    assert m.tensors["output.weight"].ggml_type == GGMLType.Q6_K


def test_split_and_merge(tiny, tmp_path):
    base = str(tmp_path / "shard")
    paths = split_gguf(tiny, base, max_tensors=7)
    assert len(paths) > 1
    assert paths[0].endswith(f"-00001-of-{len(paths):05d}.gguf")
    # reader consumes the split set transparently
    m = GGUFModel.open(paths[0])
    orig = GGUFModel.open(tiny)
    assert set(m.tensors) == set(orig.tensors)
    # merge back and compare tensor bytes
    merged = str(tmp_path / "merged.gguf")
    n = merge_gguf(paths[0], merged)
    assert n == len(orig.tensors)
    m2 = GGUFModel.open(merged)
    for name, ti in orig.tensors.items():
        a = np.asarray(m2.tensors[name].data).tobytes()
        b = np.asarray(ti.data).tobytes()
        assert a == b, name


def test_split_model_loads_and_runs(tiny, tmp_path):
    from prima_tpu.models.loader import load_model
    from prima_tpu.models.llama import ForwardOptions
    from prima_tpu.runtime.engine import Engine

    base = str(tmp_path / "sp")
    paths = split_gguf(tiny, base, max_tensors=9)
    lm = load_model(paths[0])
    eng = Engine(lm.cfg, lm.params, n_slots=1, max_seq=64,
                 opts=ForwardOptions(matmul_impl="xla"))
    got = eng.run_to_completion([3, 5, 7], n_predict=4)
    lm0 = load_model(tiny)
    eng0 = Engine(lm0.cfg, lm0.params, n_slots=1, max_seq=64,
                  opts=ForwardOptions(matmul_impl="xla"))
    assert got == eng0.run_to_completion([3, 5, 7], n_predict=4)


def test_perplexity_runs_and_is_finite(tiny):
    from prima_tpu.models.loader import load_model
    from prima_tpu.tools.perplexity import compute_perplexity

    lm = load_model(tiny)
    text = "the quick brown fox jumps over the lazy dog. " * 40
    ppl, n = compute_perplexity(lm, text, n_ctx=64, matmul="xla", max_chunks=2,
                                logfile=open(os.devnull, "w"))
    assert n > 0 and math.isfinite(ppl) and ppl > 1.0


def test_perplexity_f32_vs_q8_close(tiny, tmp_path):
    """Quantization to Q8_0 must barely move perplexity (the test-quantize
    error-budget spirit applied end-to-end)."""
    from prima_tpu.models.loader import load_model
    from prima_tpu.tools.perplexity import compute_perplexity

    text = "the quick brown fox jumps over the lazy dog. " * 30
    lm_a = load_model(tiny)
    ppl_a, _ = compute_perplexity(lm_a, text, n_ctx=64, matmul="xla", max_chunks=1,
                                  logfile=open(os.devnull, "w"))
    dst = str(tmp_path / "q8.gguf")
    quantize_gguf(tiny, dst, "Q8_0", logfile=open(os.devnull, "w"))
    lm_b = load_model(dst)
    ppl_b, _ = compute_perplexity(lm_b, text, n_ctx=64, matmul="xla", max_chunks=1,
                                  logfile=open(os.devnull, "w"))
    assert abs(math.log(ppl_a) - math.log(ppl_b)) < 0.05
