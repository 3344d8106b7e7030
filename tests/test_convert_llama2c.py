"""convert-llama2c-to-ggml analogue: synthetic llama2.c checkpoint +
tokenizer.bin -> GGUF -> loader -> greedy decode, with a numpy oracle of
the llama2.c forward pass for logit parity."""

import struct

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

DIM, HID, L, H, KV, VOCAB, SEQ = 32, 48, 2, 4, 2, 64, 16
HEAD = DIM // H
KV_DIM = DIM * KV // H


def _write_llama2c(path: str, shared: bool, rng, vocab: int = VOCAB) -> dict:
    VOCAB = vocab
    w = {
        "tok_embd": rng.standard_normal((VOCAB, DIM)).astype(np.float32) * 0.1,
        "rms_att": 1.0 + 0.05 * rng.standard_normal((L, DIM)).astype(np.float32),
        "wq": rng.standard_normal((L, DIM, DIM)).astype(np.float32) * 0.1,
        "wk": rng.standard_normal((L, KV_DIM, DIM)).astype(np.float32) * 0.1,
        "wv": rng.standard_normal((L, KV_DIM, DIM)).astype(np.float32) * 0.1,
        "wo": rng.standard_normal((L, DIM, DIM)).astype(np.float32) * 0.1,
        "rms_ffn": 1.0 + 0.05 * rng.standard_normal((L, DIM)).astype(np.float32),
        "w1": rng.standard_normal((L, HID, DIM)).astype(np.float32) * 0.1,
        "w2": rng.standard_normal((L, DIM, HID)).astype(np.float32) * 0.1,
        "w3": rng.standard_normal((L, HID, DIM)).astype(np.float32) * 0.1,
        "rms_final": 1.0 + 0.05 * rng.standard_normal(DIM).astype(np.float32),
    }
    if not shared:
        w["wcls"] = rng.standard_normal((VOCAB, DIM)).astype(np.float32) * 0.1
    with open(path, "wb") as f:
        f.write(struct.pack("<7i", DIM, HID, L, H, KV,
                            VOCAB if shared else -VOCAB, SEQ))
        order = ["tok_embd", "rms_att", "wq", "wk", "wv", "wo", "rms_ffn",
                 "w1", "w2", "w3", "rms_final"]
        for k in order:
            f.write(w[k].tobytes())
        f.write(np.zeros(SEQ * HEAD, np.float32).tobytes())  # freq_cis
        if not shared:
            f.write(w["wcls"].tobytes())
    return w


def _write_tokenizer_bin(path: str):
    texts = ["<unk>", "<s>", "</s>"] + [f"<0x{i:02X}>" for i in range(8)]
    texts += [f" tok{i}" for i in range(VOCAB - len(texts) - 1)] + [""]
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 16))
        for i, t in enumerate(texts):
            b = t.encode()
            f.write(struct.pack("<fI", float(-i), len(b)) + b)
    return texts


def _oracle_logits(w, tokens):
    """Minimal numpy llama2.c forward (run.c semantics, f32)."""
    def rms(x, g):
        return x / np.sqrt((x * x).mean() + 1e-5) * g

    def rope(v, pos):
        out = v.copy().reshape(-1, HEAD)
        for h in range(out.shape[0]):
            for j in range(0, HEAD, 2):
                freq = 1.0 / (10000.0 ** (j / HEAD))
                a = pos * freq
                c, s = np.cos(a), np.sin(a)
                x0, x1 = out[h, j], out[h, j + 1]
                out[h, j], out[h, j + 1] = x0 * c - x1 * s, x0 * s + x1 * c
        return out.reshape(-1)

    ks = [[] for _ in range(L)]
    vs = [[] for _ in range(L)]
    for pos, tok in enumerate(tokens):
        x = w["tok_embd"][tok].copy()
        for li in range(L):
            xb = rms(x, w["rms_att"][li])
            q = rope(w["wq"][li] @ xb, pos)
            k = rope(w["wk"][li] @ xb, pos)
            v = w["wv"][li] @ xb
            ks[li].append(k)
            vs[li].append(v)
            out = np.zeros(DIM, np.float32)
            group = H // KV
            for h in range(H):
                kvh = h // group
                qh = q[h * HEAD:(h + 1) * HEAD]
                scores = np.array([
                    kk.reshape(KV, HEAD)[kvh] @ qh / np.sqrt(HEAD)
                    for kk in ks[li]])
                p = np.exp(scores - scores.max())
                p /= p.sum()
                att = sum(pi * vv.reshape(KV, HEAD)[kvh]
                          for pi, vv in zip(p, vs[li]))
                out[h * HEAD:(h + 1) * HEAD] = att
            x = x + w["wo"][li] @ out
            xb = rms(x, w["rms_ffn"][li])
            g = w["w1"][li] @ xb
            g = g / (1.0 + np.exp(-g))  # silu
            x = x + w["w2"][li] @ (g * (w["w3"][li] @ xb))
        x = rms(x, w["rms_final"])
    return w.get("wcls", w["tok_embd"]) @ x


@pytest.mark.parametrize("shared", [True, False])
def test_convert_and_logit_parity(tmp_path, shared):
    from prima_tpu.models.llama import ForwardOptions
    from prima_tpu.models.loader import load_model
    from prima_tpu.runtime.engine import Engine
    from prima_tpu.tools.convert_llama2c import convert

    rng = np.random.default_rng(7 if shared else 8)
    ckpt = str(tmp_path / "model.bin")
    tokb = str(tmp_path / "tokenizer.bin")
    out = str(tmp_path / "out.gguf")
    w = _write_llama2c(ckpt, shared, rng)
    _write_tokenizer_bin(tokb)
    convert(ckpt, tokb, out)

    m = load_model(out, dtype=np.float32)  # f32 weights for exact parity
    assert m.cfg.n_layers == L and m.cfg.n_vocab == VOCAB
    assert m.cfg.n_kv_heads == KV

    tokens = [1, 5, 17, 33]
    eng = Engine(m.cfg, m.params, n_slots=1, max_seq=SEQ,
                 opts=ForwardOptions(matmul_impl="xla", dtype=np.float32),
                 kv_dtype=np.float32)
    slot = eng.submit(tokens, n_predict=1)
    eng.prefill_only(slot)
    got = eng.verify_chain(slot.id, [tokens[-1]])[-1]
    want = _oracle_logits(w, tokens)
    np.testing.assert_allclose(got[:VOCAB], want, rtol=2e-3, atol=2e-3)


def test_vocab_fixups(tmp_path):
    from prima_tpu.tools.convert_llama2c import load_vocab

    tokb = str(tmp_path / "tokenizer.bin")
    _write_tokenizer_bin(tokb)
    tokens, scores, types = load_vocab(tokb, VOCAB)
    assert tokens[0] == "<unk>" and types[0] == 2
    assert tokens[1] == "<s>" and tokens[2] == "</s>"
    assert types[1] == types[2] == 3
    assert types[3] == 6  # <0x00> byte token
    assert tokens[11].startswith("▁tok")  # whitespace escaped
    assert types[-1] == 3  # empty text -> control
    assert scores[5] == -5.0


def test_gguf_vocab_copy(tmp_path):
    """--copy-vocab-from-model with a GGUF source."""
    from prima_tpu.gguf.reader import GGUFModel
    from prima_tpu.tools.convert_llama2c import convert
    from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf

    donor = str(tmp_path / "donor.gguf")
    make_tiny_gguf(donor, seed=3)
    d = GGUFModel.open(donor)
    n_vocab = len(d.get("tokenizer.ggml.tokens"))
    d.close()
    ckpt = str(tmp_path / "model.bin")
    out = str(tmp_path / "out.gguf")
    _write_llama2c(ckpt, True, np.random.default_rng(9), vocab=n_vocab)
    convert(ckpt, donor, out)
    from prima_tpu.models.loader import load_model

    m = load_model(out)
    assert m.tokenizer.vocab.n_tokens == n_vocab
