"""GRIT dual-mode tool (reference examples/gritlm/gritlm.cpp): non-causal
instruction-masked embeddings + causal generation from one checkpoint."""

import numpy as np
import pytest

from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path, seed=3)
    from prima_tpu.models.loader import load_model

    return load_model(path)


def test_encode_normalized_and_instruction_masked(tiny_model):
    from prima_tpu.tools.gritlm import encode, gritlm_instruction

    inst = gritlm_instruction("retrieve stuff")
    embs = encode(tiny_model, ["hello world", "goodbye moon"], inst)
    assert embs.shape[0] == 2
    assert np.allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-4)
    # pooling skips instruction tokens: a different instruction changes the
    # context (bidirectional) but the pooled span is the sentence only
    embs2 = encode(tiny_model, ["hello world"], gritlm_instruction(""))
    assert embs2.shape == (1, embs.shape[1])


def test_noncausal_differs_from_causal(tiny_model):
    """llama_set_causal_attn(false): bidirectional embeddings must differ
    from the engine's causal mean-pooled embedding of the same text."""
    from prima_tpu.models.llama import ForwardOptions
    from prima_tpu.runtime.engine import Engine
    from prima_tpu.tools.gritlm import encode

    text = "hello world and more words"
    bi = encode(tiny_model, [text], "")[0]
    eng = Engine(tiny_model.cfg, tiny_model.params, n_slots=1, max_seq=64,
                 opts=ForwardOptions(matmul_impl="xla"))
    causal = eng.embed(tiny_model.tokenizer.encode(text, add_special=True))
    causal = causal / np.linalg.norm(causal)
    assert not np.allclose(bi, causal, atol=1e-3)


def test_gritlm_tool_demo(tiny_model, tmp_path, capsys):
    import io
    import sys

    from prima_tpu.tools.gritlm import main

    path = str(tmp_path / "tiny.gguf")
    make_tiny_gguf(path, seed=3)
    old = sys.stdout
    sys.stdout = cap = io.StringIO()
    try:
        rc = main(["-m", path, "--mode", "embed", "-p", "a b\\nc d",
                   "--matmul", "xla"])
    finally:
        sys.stdout = old
    assert rc == 0
    out = cap.getvalue()
    assert "embedding 0:" in out and "cosine(0,1)" in out
