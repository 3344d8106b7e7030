"""The tiny-pair trainer (prima_tpu/tools/train_tiny_pair.py) must produce
GGUFs whose decode through the PRODUCT path (loader -> models/llama.forward)
matches its own training forward — otherwise the speculative acceptance it
measures wouldn't transfer to the real pipeline."""

import numpy as np
import pytest

from prima_tpu.tools.train_tiny_pair import (N_VOCAB, encode_bytes,
                                             gather_corpus, init_params,
                                             make_cfg, save_gguf, train,
                                             train_forward)


def test_corpus_and_encoding():
    data = gather_corpus(max_bytes=1 << 16)
    assert len(data) == 1 << 16
    ids = encode_bytes(data)
    assert ids.min() >= 3 and ids.max() < N_VOCAB


def test_train_forward_matches_product_forward(tmp_path):
    """Init (untrained) params, save F32 GGUF, load through load_model, and
    compare full-sequence logits train_forward vs forward prefill."""
    import jax.numpy as jnp

    from prima_tpu.models.llama import (ForwardOptions, forward,
                                        init_kv_caches)
    from prima_tpu.models.loader import load_model
    from prima_tpu.ops.layers import rope_freqs

    cfg = make_cfg(2, 64, 2, 96, n_ctx=64)
    params = init_params(cfg, seed=3)
    path = str(tmp_path / "t.gguf")
    save_gguf(path, cfg, params, "t", ftype_name="F32")

    model = load_model(path)
    assert model.cfg.n_layers == 2 and model.cfg.n_vocab == N_VOCAB

    toks = np.array([[5, 99, 200, 31, 77, 4, 250, 12]], np.int32)
    inv_freq, _ = rope_freqs(cfg)
    want = np.asarray(train_forward(
        {k: (v if k != "layers" else v) for k, v in params.items()},
        cfg, jnp.asarray(toks), inv_freq))

    T = toks.shape[1]
    kv = init_kv_caches(model.cfg, 1, 64)
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    logits, _kv = forward(model.params, model.cfg, jnp.asarray(toks), pos,
                          kv, jnp.zeros((1,), jnp.int32),
                          ForwardOptions(matmul_impl="xla",
                                         dtype=jnp.float32))
    got = np.asarray(logits)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert err < 2e-2, f"product forward disagrees with trainer: {err}"
    # greedy argmax agreement is what speculative acceptance rides on
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree == 1.0


@pytest.mark.slow
def test_short_training_reduces_loss(tmp_path):
    data = encode_bytes(gather_corpus(max_bytes=1 << 18))
    cfg = make_cfg(2, 64, 2, 96, n_ctx=64)
    params, stats = train(cfg, data, steps=60, batch=4, seq=32, chunk=20,
                          log=lambda *_a, **_k: None)
    first, last = stats["loss_history"][0], stats["final_train_loss"]
    assert last < first - 0.5, f"no learning: {first} -> {last}"
    p = str(tmp_path / "m.gguf")
    save_gguf(p, cfg, params, "m", ftype_name="Q8_0")
    from prima_tpu.models.loader import load_model

    model = load_model(p)
    assert model.tokenizer is not None
