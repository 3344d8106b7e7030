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
    # llama_tensor_get_type bumps attn_v/ffn_down by LAYER POSITION
    # (use_more_bits @19278): for n_layer=2, layer 0 stays Q4_K and
    # layer 1 (>= 7n/8) is promoted to Q6_K
    assert m.tensors["blk.0.attn_v.weight"].ggml_type == GGMLType.Q4_K
    assert m.tensors["blk.1.attn_v.weight"].ggml_type == GGMLType.Q6_K
    assert m.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q4_K
    assert m.tensors["blk.1.ffn_down.weight"].ggml_type == GGMLType.Q6_K
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


def test_export_lora_merge(tiny, tmp_path):
    """export-lora: merged model forward == runtime apply_lora (f16 merge)."""
    import jax.numpy as jnp

    from prima_tpu.gguf.writer import GGUFWriter
    from prima_tpu.models.adapters import apply_lora, load_lora_gguf
    from prima_tpu.models.llama import ForwardOptions, forward, init_kv_caches
    from prima_tpu.models.loader import load_model
    from prima_tpu.tools.export_lora import export_lora

    model = load_model(tiny)
    cfg = model.cfg
    rng = np.random.default_rng(1)
    lpath = str(tmp_path / "adapter.gguf")
    w = GGUFWriter(lpath, arch="llama")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", 8.0)
    a = (rng.standard_normal((4, cfg.n_embd)) * 0.05).astype(np.float32)
    b = (rng.standard_normal((cfg.n_heads * cfg.head_dim, 4)) * 0.05).astype(np.float32)
    w.add_tensor("blk.0.attn_q.weight.lora_a", a)
    w.add_tensor("blk.0.attn_q.weight.lora_b", b)
    w.write()

    merged_path = str(tmp_path / "merged.gguf")
    n = export_lora(tiny, [(lpath, 1.0)], merged_path)
    assert n == 1

    merged = load_model(merged_path)
    m = GGUFModel.open(merged_path)
    assert m.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.F16
    m.close()

    toks = np.array([[3, 5, 7]], dtype=np.int32)
    pos = np.broadcast_to(np.arange(3, dtype=np.int32), (1, 3))
    opts = ForwardOptions(matmul_impl="xla")

    def logits_of(params, c):
        kv = init_kv_caches(c, 1, 16, dtype=jnp.float32)
        out, _ = forward(params, c, jnp.asarray(toks), jnp.asarray(pos), kv,
                         jnp.zeros(1, jnp.int32), opts)
        return np.asarray(out)

    lp = apply_lora(model.params, load_lora_gguf(lpath, dtype=jnp.float32))
    want = logits_of(lp, cfg)
    got = logits_of(merged.params, merged.cfg)
    # merged weights round through f16 once
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_tokenize_tool(tiny, capsys):
    from prima_tpu.tools.tokenize import main as tok_main

    rc = tok_main(["-m", tiny, "-p", "hello world", "--show-count"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "->" in out and "Total number of tokens:" in out
    rc = tok_main(["-m", tiny, "-p", "hi", "--ids"])
    assert rc == 0
    ids = capsys.readouterr().out.strip()
    assert ids.startswith("[") and ids.endswith("]")


def test_gguf_hash_tool(tiny, capsys):
    from prima_tpu.tools.gguf_hash import main as hash_main

    rc = hash_main([tiny, "--all"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sha256" in out and "sha1" in out and "crc32" in out
    # deterministic
    hash_main([tiny])
    out1 = capsys.readouterr().out
    hash_main([tiny])
    out2 = capsys.readouterr().out
    assert out1 == out2


def test_gbnf_validator_tool(tmp_path, capsys):
    from prima_tpu.tools.gbnf_validator import main as val_main, validate

    g = 'root ::= "a"+ "b"'
    ok, pos = validate(g, b"aaab")
    assert ok and pos == 4
    ok, pos = validate(g, b"aac")
    assert not ok and pos == 2
    ok, _ = validate(g, b"aa")  # incomplete
    assert not ok

    gf = tmp_path / "g.gbnf"
    gf.write_text(g)
    tf = tmp_path / "t.txt"
    tf.write_text("ab")
    assert val_main([str(gf), str(tf)]) == 0
    assert "valid" in capsys.readouterr().out
    tf.write_text("ba")
    assert val_main([str(gf), str(tf)]) == 1
    assert "invalid" in capsys.readouterr().out


def test_quantize_stats_tool(tiny, capsys):
    from prima_tpu.tools.quantize_stats import main as qs_main

    rc = qs_main(["-m", tiny, "--type", "q8_0", "--type", "q4_0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Q8_0" in out and "Q4_0" in out and "rmse" in out
    # q8_0 must round-trip much tighter than q4_0 (the tiny model's weights
    # are natively Q4_K, so q4_K itself would round-trip exactly)
    import re as _re

    rmses = {mm.group(1): float(mm.group(2))
             for mm in _re.finditer(r"(\w+)\s+total: rmse ([0-9.]+)", out)}
    assert rmses["Q8_0"] < rmses["Q4_0"]


def test_batched_bench_tool(tiny, capsys):
    from prima_tpu.tools.batched_bench import main as bb_main

    rc = bb_main(["-m", tiny, "-npp", "8", "-ntg", "4", "-npl", "1,2",
                  "-c", "64", "--matmul", "xla"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "S_TG t/s" in out
    rows = [ln for ln in out.splitlines() if ln.startswith("|     8 |")]
    assert len(rows) == 2


def test_cvector_generator(tiny, tmp_path):
    """cvector-generator: directions load back and steer the model."""
    import jax.numpy as jnp

    from prima_tpu.models.adapters import apply_control_vector, load_control_vector
    from prima_tpu.models.llama import ForwardOptions, forward, init_kv_caches
    from prima_tpu.models.loader import load_model
    from prima_tpu.tools.cvector_generator import generate_cvector

    out = str(tmp_path / "cvec.gguf")
    n = generate_cvector(tiny, ["happy happy joy", "wonderful day"],
                         ["sad sad gloom", "terrible day"], out)
    model = load_model(tiny)
    assert n == model.cfg.n_layers

    cvec = load_control_vector(out, strength=5.0)
    assert set(cvec) == set(range(1, n + 1))
    for v in cvec.values():
        assert v.shape == (model.cfg.n_embd,)
        assert abs(float(jnp.linalg.norm(v)) - 5.0) < 1e-3  # unit PCA dir * 5

    toks = np.array([[3, 5, 7]], dtype=np.int32)
    pos = np.broadcast_to(np.arange(3, dtype=np.int32), (1, 3))
    opts = ForwardOptions(matmul_impl="xla")

    def logits_of(params):
        kv = init_kv_caches(model.cfg, 1, 8, dtype=jnp.float32)
        out_, _ = forward(params, model.cfg, jnp.asarray(toks), jnp.asarray(pos),
                          kv, jnp.zeros(1, jnp.int32), opts)
        return np.asarray(out_)

    base = logits_of(model.params)
    steered = logits_of(apply_control_vector(model.params, cvec))
    assert not np.allclose(base, steered)


def test_passkey_prompt_and_run(tiny, capsys):
    from prima_tpu.tools.passkey import build_prompt, main as pk_main

    p = build_prompt(5, 2, 1234)
    assert "The pass key is 1234" in p and p.count("grass is green") == 5
    # tiny random-weight model won't recover the key — just exercise the loop
    rc = pk_main(["-m", tiny, "--junk", "2", "--pos", "1", "-s", "3",
                  "-c", "512", "-n", "4", "--matmul", "xla"])
    out = capsys.readouterr().out
    assert "passkey" in out and rc in (0, 1)


def test_quantize_ternary_tq(tiny, tmp_path):
    """TQ1_0/TQ2_0 ternary re-quantization (llama_model_quantize
    LLAMA_FTYPE_MOSTLY_TQ*, @19640-19641): weights become ternary blocks,
    token_embd falls back to Q4_K (llama_tensor_get_type @19331-19333),
    output takes the generic Q6_K output rule (@19308), and the model
    still loads and decodes."""
    for ft, gt in (("TQ1_0", GGMLType.TQ1_0), ("TQ2_0", GGMLType.TQ2_0)):
        dst = str(tmp_path / f"{ft.lower()}.gguf")
        stats = quantize_gguf(tiny, dst, ft, logfile=open(os.devnull, "w"))
        assert stats["n_tensors"] > 0
        m = GGUFModel.open(dst)
        assert m.tensors["blk.0.attn_q.weight"].ggml_type == gt
        assert m.tensors["token_embd.weight"].ggml_type == GGMLType.Q4_K
        assert m.tensors["output.weight"].ggml_type == GGMLType.Q6_K
        assert m.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
        # each 256-block dequantizes to scale * {-1, 0, 1}
        from prima_tpu.quant.dequant_np import dequantize_tensor

        wq = dequantize_tensor(m.tensors["blk.0.attn_q.weight"])
        blocks = wq.reshape(-1, 256)
        scale = np.abs(blocks).max(axis=1, keepdims=True)
        nz = scale[:, 0] > 0
        tr = blocks[nz] / scale[nz]
        assert np.allclose(np.abs(tr) * (np.abs(tr) > 1e-6), 
                           (np.abs(tr) > 1e-6).astype(np.float32))
        m.close()
        from prima_tpu.models.loader import load_model
        from prima_tpu.models.llama import ForwardOptions
        from prima_tpu.runtime.engine import Engine

        lm = load_model(dst)
        eng = Engine(lm.cfg, lm.params, n_slots=1, max_seq=64,
                     opts=ForwardOptions(matmul_impl="xla"))
        out = eng.run_to_completion([3, 5, 7], n_predict=4)
        assert len(out) == 4


def test_quantize_bf16(tiny, tmp_path):
    """BF16 ftype (LLAMA_FTYPE_MOSTLY_BF16): round-to-nearest-even
    truncation, loads and decodes."""
    dst = str(tmp_path / "bf16.gguf")
    quantize_gguf(tiny, dst, "BF16", logfile=open(os.devnull, "w"))
    m = GGUFModel.open(dst)
    assert m.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.BF16
    src = GGUFModel.open(tiny)
    from prima_tpu.quant.dequant_np import dequantize_tensor

    got = dequantize_tensor(m.tensors["blk.0.attn_q.weight"])
    want = dequantize_tensor(src.tensors["blk.0.attn_q.weight"])
    # bf16 keeps the top 8 significand bits (RNE)
    assert np.abs(got - want).max() <= np.abs(want).max() * 2.0 ** -8
    m.close(), src.close()


def test_eval_callback_tool(tiny, capsys):
    from prima_tpu.tools.eval_callback import main as ec_main

    rc = ec_main(["-m", tiny, "-p", "hello", "--matmul", "xla"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "blk.0.attn_q.weight" in out and "logits:" in out


def test_gen_docs(tmp_path):
    """prima-gen-docs (examples/gen-docs analogue) writes per-tool help."""
    from prima_tpu.tools.gen_docs import main

    out = str(tmp_path / "cli")
    assert main(["-o", out]) == 0
    import os

    files = os.listdir(out)
    assert "README.md" in files and "cli.md" in files and "server.md" in files
    text = open(os.path.join(out, "cli.md")).read()
    assert "--prompt" in text or "-p" in text


def test_simple_tool(tmp_path, capsys):
    """prima-simple (examples/simple): the minimal decode loop."""
    import io
    import sys as _sys

    from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf
    from prima_tpu.tools.simple import main

    path = str(tmp_path / "tiny.gguf")
    make_tiny_gguf(path, seed=3)
    old = _sys.stdout
    _sys.stdout = cap = io.StringIO()
    try:
        rc = main(["-m", path, "-p", "Hello", "-n", "6", "--matmul", "xla"])
    finally:
        _sys.stdout = old
    assert rc == 0
    assert cap.getvalue().startswith("Hello")
    assert "t/s" in capsys.readouterr().err
