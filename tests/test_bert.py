"""BERT encoder: HF conversion + hidden-state parity + embeddings."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _write_bert_tokenizer_json(d, vocab_size):
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words = ["hello", "world", "the", "quick", "brown", "fox"]
    pieces = ["##s", "##ing", "##ed"]
    vocab = {}
    for t in specials + words + pieces:
        vocab[t] = len(vocab)
    i = len(vocab)
    while i < vocab_size:
        vocab[f"[unused{i}]"] = i
        i += 1
    tj = {"model": {"type": "WordPiece", "vocab": vocab}, "added_tokens": []}
    with open(os.path.join(d, "tokenizer.json"), "w") as f:
        json.dump(tj, f)


@pytest.fixture(scope="module")
def bert_gguf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bert"))
    cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, layer_norm_eps=1e-12,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    _write_bert_tokenizer_json(d, cfg.vocab_size)

    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    dst = os.path.join(d, "bert.gguf")
    n = convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w"))
    assert n > 0
    return dst, model


def test_bert_hidden_parity(bert_gguf):
    import jax.numpy as jnp

    from prima_tpu.models.bert import BertModelRuntime, bert_forward

    dst, hf_model = bert_gguf
    rt = BertModelRuntime.load(dst)
    assert rt.cfg.n_layers == 2 and rt.cfg.n_heads == 4

    ids = [2, 5, 6, 7, 3]  # [CLS] hello world the [SEP]
    with torch.no_grad():
        want = hf_model(torch.tensor([ids])).last_hidden_state[0].numpy()
    got = np.asarray(bert_forward(rt.params, rt.cfg,
                                  jnp.asarray(np.asarray([ids], np.int32)))[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_bert_embed_and_tokenize(bert_gguf):
    from prima_tpu.models.bert import BertModelRuntime

    dst, _ = bert_gguf
    rt = BertModelRuntime.load(dst)
    # WPM tokenizer: [CLS] ... [SEP] wrapping and wordpiece matching
    ids = rt.tokenizer.encode("hello worlds", add_special=True)
    assert ids[0] == 2 and ids[-1] == 3  # [CLS] ... [SEP]
    assert 5 in ids  # "hello"
    vecs = rt.embed(["hello world", "the quick brown fox", "hello world"])
    assert vecs.shape == (3, rt.cfg.n_embd)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-5)
    # identical inputs -> identical embeddings; different inputs differ
    np.testing.assert_allclose(vecs[0], vecs[2], rtol=1e-6)
    assert not np.allclose(vecs[0], vecs[1])


def test_bert_quantized(bert_gguf, tmp_path):
    from prima_tpu.models.bert import BertModelRuntime
    from prima_tpu.tools.quantize import quantize_gguf

    dst, _ = bert_gguf
    q = str(tmp_path / "q8.gguf")
    quantize_gguf(dst, q, "Q8_0", logfile=open(os.devnull, "w"))
    rt = BertModelRuntime.load(q)
    vecs = rt.embed(["hello world"])
    assert vecs.shape == (1, rt.cfg.n_embd)
    assert np.isfinite(vecs).all()


def test_bert_embeddings_server(bert_gguf):
    import http.client
    import threading

    from prima_tpu.models.bert import BertModelRuntime
    from prima_tpu.server.app import serve_embeddings

    dst, _ = bert_gguf
    rt = BertModelRuntime.load(dst)
    httpd = serve_embeddings(rt, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/v1/embeddings",
                     json.dumps({"input": ["hello world", "the fox"]}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        assert len(out["data"]) == 2
        assert len(out["data"][0]["embedding"]) == rt.cfg.n_embd
        conn.request("GET", "/health")
        assert conn.getresponse().status == 200
    finally:
        httpd.shutdown()


def test_retrieval_tool(bert_gguf, tmp_path, capsys):
    """retrieval: chunking + top-k cosine ranking over embedded chunks."""
    from prima_tpu.models.bert import BertModelRuntime
    from prima_tpu.tools.retrieval import chunk_files, top_k_chunks

    f1 = tmp_path / "a.txt"
    f1.write_text("the quick brown fox. hello world again. "
                  "the fox jumps high. worlds collide here. " * 3)
    chunks = chunk_files([str(f1)], chunk_size=40, separator=".")
    assert len(chunks) >= 2
    assert all(len(c["text"]) >= 30 for c in chunks[:-1])

    dst, _ = bert_gguf
    rt = BertModelRuntime.load(dst)
    hits = top_k_chunks(rt, chunks, "quick brown fox", k=2)
    assert len(hits) == 2
    assert hits[0][0] >= hits[1][0]
    assert all(-1.001 <= s <= 1.001 for s, _ in hits)


def test_rerank_rank_head(tmp_path):
    """Rank-head rerank (reference RANK pooling, src/llama.cpp:10919-10940)
    vs transformers BertForSequenceClassification on the same pair
    encoding [BOS]q[EOS][SEP]doc[EOS]."""
    d = str(tmp_path / "rr")
    os.makedirs(d)
    cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, layer_norm_eps=1e-12,
        hidden_act="gelu", num_labels=1,
    )
    torch.manual_seed(1)
    model = transformers.BertForSequenceClassification(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    _write_bert_tokenizer_json(d, cfg.vocab_size)

    from prima_tpu.models.bert import BertModelRuntime
    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    dst = os.path.join(d, "rr.gguf")
    convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w"))
    rt = BertModelRuntime.load(dst)
    assert rt.has_rank_head

    query, docs = "a b", ["c d e", "f"]
    scores = rt.rerank(query, docs)
    assert scores.shape == (2,)

    # torch reference on the identical token ids
    v = rt.tokenizer.vocab
    bos = v.cls_id if v.cls_id >= 0 else v.bos_id
    sep = v.sep_id if v.sep_id >= 0 else v.eos_id
    for i, doc in enumerate(docs):
        ids = ([bos] + rt.tokenizer.encode(query, add_special=False)
               + [sep, sep] + rt.tokenizer.encode(doc, add_special=False)
               + [sep])
        with torch.no_grad():
            want = model(torch.tensor([ids])).logits[0, 0].item()
        np.testing.assert_allclose(scores[i], want, rtol=2e-4, atol=2e-4)


def test_rerank_endpoint_rank_head(tmp_path):
    """/v1/rerank on the embeddings server uses the rank head."""
    import http.client
    import json as _json
    import threading

    d = str(tmp_path / "rrs")
    os.makedirs(d)
    cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, layer_norm_eps=1e-12,
        hidden_act="gelu", num_labels=1,
    )
    torch.manual_seed(2)
    model = transformers.BertForSequenceClassification(cfg)
    model.save_pretrained(d, safe_serialization=True)
    _write_bert_tokenizer_json(d, cfg.vocab_size)

    from prima_tpu.models.bert import BertModelRuntime
    from prima_tpu.server.app import serve_embeddings
    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    dst = os.path.join(d, "rr.gguf")
    convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w"))
    rt = BertModelRuntime.load(dst)
    httpd = serve_embeddings(rt, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/v1/rerank",
                     _json.dumps({"query": "a", "documents": ["b c", "d"]}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        out = _json.loads(resp.read())
        conn.close()
        assert resp.status == 200
        assert len(out["results"]) == 2
        assert {"index", "relevance_score"} <= set(out["results"][0])
    finally:
        httpd.shutdown()


def test_jina_bert_v2_parity(tmp_path):
    """jina-bert-v2 (build_bert's LLM_ARCH_JINA_BERT_V2 branches): no
    position embeddings, bidirectional ALiBi (f_max_alibi_bias=8
    @6062), optional q/k LayerNorms, attn_norm_2 second residual norm
    (@12185-12188), gated-GELU FFN with biased down (@12197). Oracle is
    an independent numpy implementation."""
    from prima_tpu.gguf.reader import GGUFModel
    from prima_tpu.gguf.writer import GGUFWriter
    from prima_tpu.models.bert import (BertConfig, bert_forward,
                                       load_bert_params)

    arch = "jina-bert-v2"
    V, E, H, FF, L = 64, 32, 4, 48, 2
    hd = E // H
    rng = np.random.default_rng(13)
    path = str(tmp_path / "jina.gguf")
    w = GGUFWriter(path, arch=arch)
    w.add_kv(f"{arch}.block_count", L)
    w.add_kv(f"{arch}.embedding_length", E)
    w.add_kv(f"{arch}.attention.head_count", H)
    w.add_kv(f"{arch}.feed_forward_length", FF)
    w.add_kv(f"{arch}.context_length", 128)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-12)
    w.add_kv(f"{arch}.attention.causal", False)
    w.add_kv(f"{arch}.vocab_size", V)
    w.add_kv("tokenizer.ggml.token_type_count", 2)
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(V)])

    dense = {}

    def add(name, rows, cols=None, around=None):
        if cols is None:
            x = (around + rng.standard_normal(rows) * 0.05).astype(np.float32)
        else:
            x = (rng.standard_normal((rows, cols)) * 0.08).astype(np.float32)
        w.add_tensor(name, x)
        dense[name] = x

    add("token_embd.weight", V, E)
    add("token_types.weight", 2, E)
    add("token_embd_norm.weight", E, around=1.0)
    add("token_embd_norm.bias", E, around=0.0)
    for i in range(L):
        p = f"blk.{i}."
        for nm, r, c in ((p + "attn_q.weight", E, E),
                         (p + "attn_k.weight", E, E),
                         (p + "attn_v.weight", E, E),
                         (p + "attn_output.weight", E, E),
                         (p + "ffn_up.weight", FF, E),
                         (p + "ffn_gate.weight", FF, E),
                         (p + "ffn_down.weight", E, FF)):
            add(nm, r, c)
        for nm in (p + "attn_q.bias", p + "attn_k.bias", p + "attn_v.bias",
                   p + "attn_output.bias"):
            add(nm, E, around=0.0)
        add(p + "ffn_down.bias", E, around=0.0)
        for nm in (p + "attn_q_norm", p + "attn_k_norm",
                   p + "attn_output_norm", p + "attn_norm_2",
                   p + "layer_output_norm"):
            add(nm + ".weight", E, around=1.0)
            add(nm + ".bias", E, around=0.0)
    w.write()

    m = GGUFModel.open(path)
    cfg = BertConfig.from_gguf(m)
    assert cfg.alibi_max_bias == 8.0 and cfg.gated_ffn
    params = load_bert_params(m, cfg)
    m.close()

    # --- numpy oracle ---
    def ln(x, wk, bk):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-12) * dense[wk] + dense[bk]

    def gelu(x):
        return 0.5 * x * (1.0 + np.tanh(
            np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))

    b, s = 2, 7
    tokens = rng.integers(0, V, size=(b, s)).astype(np.int32)
    x = dense["token_embd.weight"][tokens] + dense["token_types.weight"][0]
    x = ln(x, "token_embd_norm.weight", "token_embd_norm.bias")
    n_log2 = 1 << int(np.floor(np.log2(H)))
    m0, m1 = 2.0 ** (-8.0 / n_log2), 2.0 ** (-4.0 / n_log2)
    hidx = np.arange(H)
    slopes = np.where(hidx < n_log2, m0 ** (hidx + 1),
                      m1 ** (2 * (hidx - n_log2) + 1))
    dist = -np.abs(np.arange(s)[:, None] - np.arange(s)[None, :])
    bias = slopes[:, None, None] * dist[None]
    for i in range(L):
        p = f"blk.{i}."
        x_in = x
        q = ln(x @ dense[p + "attn_q.weight"].T + dense[p + "attn_q.bias"],
               p + "attn_q_norm.weight", p + "attn_q_norm.bias")
        k = ln(x @ dense[p + "attn_k.weight"].T + dense[p + "attn_k.bias"],
               p + "attn_k_norm.weight", p + "attn_k_norm.bias")
        v = x @ dense[p + "attn_v.weight"].T + dense[p + "attn_v.bias"]
        q = q.reshape(b, s, H, hd)
        k = k.reshape(b, s, H, hd)
        v = v.reshape(b, s, H, hd)
        sc = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd) + bias[None]
        sc = sc - sc.max(-1, keepdims=True)
        pr = np.exp(sc)
        pr /= pr.sum(-1, keepdims=True)
        at = np.einsum("bhqk,bkhd->bqhd", pr, v).reshape(b, s, E)
        at = at @ dense[p + "attn_output.weight"].T + dense[p + "attn_output.bias"]
        x = ln(x + at, p + "attn_output_norm.weight",
               p + "attn_output_norm.bias")
        x = ln(x + x_in, p + "attn_norm_2.weight", p + "attn_norm_2.bias")
        up = x @ dense[p + "ffn_up.weight"].T
        gate = x @ dense[p + "ffn_gate.weight"].T
        ff = gelu(gate) * up @ dense[p + "ffn_down.weight"].T \
            + dense[p + "ffn_down.bias"]
        x = ln(x + ff, p + "layer_output_norm.weight",
               p + "layer_output_norm.bias")
    want = x

    import jax.numpy as jnp
    got = bert_forward(params, cfg, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_jina_bert_v2_hf_conversion(tmp_path):
    """HF JinaBert checkpoint -> arch 'jina-bert-v2' GGUF: gated_layers
    splits into ffn_gate|ffn_up at intermediate_size (JinaBertV2Model
    get_tensors), no position embeddings, mlp.wo/mlp.layernorm renames."""
    import json as _json

    from safetensors.numpy import save_file

    from prima_tpu.gguf.reader import GGUFModel
    from prima_tpu.models.bert import BertConfig, bert_forward, load_bert_params
    from prima_tpu.quant.dequant_np import dequantize_tensor
    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    rng = np.random.default_rng(21)
    V, E, H, FF, L = 64, 32, 4, 48, 2

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    d = str(tmp_path / "hf")
    os.makedirs(d)
    cfg = {"architectures": ["JinaBertForMaskedLM"], "vocab_size": V,
           "hidden_size": E, "num_hidden_layers": L,
           "num_attention_heads": H, "intermediate_size": FF,
           "max_position_embeddings": 8192, "layer_norm_eps": 1e-12,
           "position_embedding_type": "alibi"}
    with open(os.path.join(d, "config.json"), "w") as f:
        _json.dump(cfg, f)
    _write_bert_tokenizer_json(d, V)
    t = {"embeddings.word_embeddings.weight": r(V, E),
         "embeddings.token_type_embeddings.weight": r(2, E),
         "embeddings.LayerNorm.weight": 1.0 + r(E),
         "embeddings.LayerNorm.bias": r(E)}
    for i in range(L):
        p = f"encoder.layer.{i}."
        for nm in ("query", "key", "value"):
            t[p + f"attention.self.{nm}.weight"] = r(E, E)
            t[p + f"attention.self.{nm}.bias"] = r(E)
        t[p + "attention.output.dense.weight"] = r(E, E)
        t[p + "attention.output.dense.bias"] = r(E)
        t[p + "attention.output.LayerNorm.weight"] = 1.0 + r(E)
        t[p + "attention.output.LayerNorm.bias"] = r(E)
        t[p + "mlp.gated_layers.weight"] = r(2 * FF, E)
        t[p + "mlp.wo.weight"] = r(E, FF)
        t[p + "mlp.wo.bias"] = r(E)
        t[p + "mlp.layernorm.weight"] = 1.0 + r(E)
        t[p + "mlp.layernorm.bias"] = r(E)
    save_file(t, os.path.join(d, "model.safetensors"))

    dst = str(tmp_path / "jina.gguf")
    assert convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w")) > 0
    m = GGUFModel.open(dst)
    assert m.arch == "jina-bert-v2"
    gl = t["encoder.layer.0.mlp.gated_layers.weight"]
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.ffn_gate.weight"]), gl[:FF])
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.0.ffn_up.weight"]), gl[FF:])
    np.testing.assert_array_equal(
        dequantize_tensor(m.tensors["blk.1.layer_output_norm.weight"]),
        t["encoder.layer.1.mlp.layernorm.weight"])
    assert "position_embd.weight" not in m.tensors
    bcfg = BertConfig.from_gguf(m)
    assert bcfg.alibi_max_bias == 8.0 and bcfg.gated_ffn
    params = load_bert_params(m, bcfg)
    toks = np.asarray([[2, 5, 9, 11]], np.int32)
    emb = bert_forward(params, bcfg, toks,
                       np.ones_like(toks, np.float32))
    assert np.isfinite(np.asarray(emb)).all()
    m.close()
