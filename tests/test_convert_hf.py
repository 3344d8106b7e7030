"""HF -> GGUF conversion with logit parity against transformers itself."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _bytes_unicode():
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return [chr(c) for c in cs]


def _write_tokenizer_json(path, vocab_size):
    chars = _bytes_unicode()
    vocab = {}
    i = 0
    for ch in chars:
        if i >= vocab_size:
            break
        vocab[ch] = i
        i += 1
    while i < vocab_size:
        vocab[f"<extra_{i}>"] = i
        i += 1
    tj = {"model": {"type": "BPE", "vocab": vocab, "merges": []}, "added_tokens": []}
    with open(os.path.join(path, "tokenizer.json"), "w") as f:
        json.dump(tj, f)


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hf"))
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    _write_tokenizer_json(d, cfg.vocab_size)
    return d, model


def test_convert_and_logit_parity(hf_checkpoint, tmp_path):
    import jax.numpy as jnp

    from prima_tpu.models.llama import ForwardOptions, forward, init_kv_caches
    from prima_tpu.models.loader import load_model
    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    src, hf_model = hf_checkpoint
    dst = str(tmp_path / "m.gguf")
    n = convert_hf_to_gguf(src, dst, "F32", logfile=open(os.devnull, "w"))
    assert n > 0

    lm = load_model(dst, dtype=jnp.float32)
    assert lm.cfg.arch == "llama" and lm.cfg.n_layers == 2

    tokens = [3, 77, 200, 5, 131]
    with torch.no_grad():
        want = hf_model(torch.tensor([tokens])).logits[0].float().numpy()

    kv = init_kv_caches(lm.cfg, 1, 32, jnp.float32)
    pos = np.arange(len(tokens), dtype=np.int32)[None]
    got, _ = forward(lm.params, lm.cfg, np.asarray([tokens], np.int32), pos, kv,
                     np.zeros(1, np.int32), ForwardOptions(matmul_impl="xla",
                                                           dtype=jnp.float32))
    got = np.asarray(got[0])
    # same math, different framework: tight tolerance
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_convert_quantized_loads(hf_checkpoint, tmp_path):
    from prima_tpu.models.loader import load_model
    from prima_tpu.models.llama import ForwardOptions
    from prima_tpu.runtime.engine import Engine
    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    src, _ = hf_checkpoint
    dst = str(tmp_path / "q8.gguf")
    convert_hf_to_gguf(src, dst, "Q8_0", logfile=open(os.devnull, "w"))
    lm = load_model(dst)
    eng = Engine(lm.cfg, lm.params, n_slots=1, max_seq=64,
                 opts=ForwardOptions(matmul_impl="xla"))
    out = eng.run_to_completion([3, 77, 200], n_predict=4)
    assert len(out) == 4
