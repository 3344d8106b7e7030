"""imatrix: collection taps, file format, weighted quantization quality."""

import numpy as np
import pytest

from prima_tpu.gguf.constants import GGMLType
from prima_tpu.quant import quantize_imatrix as qi
from prima_tpu.quant.dequant_np import DEQUANT_FNS
from prima_tpu.quant.quantize_np import quantize
from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

ROWS, K = 16, 512


def _dequant(raw, t, k):
    return DEQUANT_FNS[t](np.ascontiguousarray(raw), k)


@pytest.fixture()
def xw():
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((ROWS, K)) * 0.05).astype(np.float32)
    # strongly non-uniform importance: first half of columns matter 100x more
    qw = np.ones(K, np.float32)
    qw[: K // 2] = 100.0
    return x, qw


@pytest.mark.parametrize("t", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K],
                         ids=lambda t: t.name)
def test_weighted_valid_and_accurate(xw, t):
    x, qw = xw
    raw = qi.quantize_weighted(x, t, qw)
    y = _dequant(raw, t, K)
    # overall quality stays sane even though the 100x importance skew
    # deliberately sacrifices the unimportant half
    rmse = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x * x))
    assert rmse < {GGMLType.Q4_K: 0.12, GGMLType.Q5_K: 0.07,
                   GGMLType.Q6_K: 0.04}[t]


@pytest.mark.parametrize("t", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K],
                         ids=lambda t: t.name)
def test_weighted_beats_unweighted_on_weighted_metric(xw, t):
    x, qw = xw
    yw = _dequant(qi.quantize_weighted(x, t, qw), t, K)
    yu = _dequant(quantize(x, t), t, K)
    werr_w = np.sum(qw * (x - yw) ** 2)
    werr_u = np.sum(qw * (x - yu) ** 2)
    assert werr_w <= werr_u * 1.001  # never worse where it counts
    # and strictly better on the important half for at least one format
    if t == GGMLType.Q4_K:
        assert werr_w < werr_u * 0.95


def test_imatrix_file_roundtrip(tmp_path):
    path = str(tmp_path / "x.imatrix")
    vals = np.arange(8, dtype=np.float32) + 1
    qi.save_imatrix(path, {"blk.0.attn_q.weight": (vals * 3, 3)}, 3, "data.txt")
    loaded = qi.load_imatrix(path)
    np.testing.assert_allclose(loaded["blk.0.attn_q.weight"], vals)


def test_collect_and_quantize_end_to_end(tmp_path):
    from prima_tpu.models.loader import load_model
    from prima_tpu.tools.imatrix import collect_imatrix, main as imatrix_main
    from prima_tpu.tools.quantize import quantize_gguf

    gguf = str(tmp_path / "tiny.gguf")
    make_tiny_gguf(gguf, seed=3)
    model = load_model(gguf)
    corpus = str(tmp_path / "c.txt")
    open(corpus, "w").write("the quick brown fox jumps over the lazy dog. " * 30)

    out = str(tmp_path / "t.imatrix")
    rc = imatrix_main(["-m", gguf, "-f", corpus, "-o", out, "-c", "32",
                       "--chunks", "2"])
    assert rc == 0
    im = qi.load_imatrix(out)
    # one entry per matmul weight: 7 per layer + output head
    n_layers = model.cfg.n_layers
    assert len(im) == 7 * n_layers + (0 if model.cfg.tie_embeddings else 1)
    assert all(np.all(v >= 0) and np.any(v > 0) for v in im.values())
    assert len(im["blk.0.attn_q.weight"]) == model.cfg.n_embd

    dst = str(tmp_path / "q.gguf")
    stats = quantize_gguf(gguf, dst, "Q4_K_M", imatrix=im,
                          logfile=open("/dev/null", "w"))
    assert stats["n_tensors"] > 0
    # the result loads and decodes
    m2 = load_model(dst)
    assert m2.cfg.n_layers == n_layers


def test_iq4_xs_weighted(xw):
    x, qw = xw
    t = GGMLType.IQ4_XS
    yw = _dequant(qi.quantize_weighted(x, t, qw), t, K)
    yu = _dequant(qi.quantize_weighted(x, t, None), t, K)
    assert np.sqrt(np.mean((x - yu) ** 2)) / np.sqrt(np.mean(x * x)) < 0.1
    assert np.sum(qw * (x - yw) ** 2) <= np.sum(qw * (x - yu) ** 2) * 1.001
