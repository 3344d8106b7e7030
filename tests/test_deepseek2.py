"""DeepSeek-V2 (MLA + MoE): HF conversion + logit parity + generation."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

if not hasattr(transformers, "DeepseekV2ForCausalLM"):
    pytest.skip("transformers lacks DeepseekV2", allow_module_level=True)

from test_convert_hf import _write_tokenizer_json  # noqa: E402

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)


@pytest.fixture(scope="module")
def ds2_gguf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ds2"))
    cfg = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=32, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, routed_scaling_factor=1.0,
        norm_topk_prob=False, scoring_func="softmax", topk_method="greedy",
        n_group=1, topk_group=1, rope_theta=10000.0,
        max_position_embeddings=64, tie_word_embeddings=False,
        attention_bias=False, rms_norm_eps=1e-6, aux_loss_alpha=0.0,
    )
    torch.manual_seed(0)
    model = transformers.DeepseekV2ForCausalLM(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    _write_tokenizer_json(d, cfg.vocab_size)

    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    dst = os.path.join(d, "ds2.gguf")
    n = convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w"))
    assert n > 0
    return dst, model


def test_deepseek2_parity(ds2_gguf):
    from prima_tpu.models.deepseek2 import DeepseekV2Runtime, deepseek2_forward

    dst, hf_model = ds2_gguf
    rt = DeepseekV2Runtime.load(dst)
    assert rt.cfg.q_lora_rank == 32 and rt.cfg.kv_lora_rank == 16
    assert rt.cfg.qk_nope == 16 and rt.cfg.qk_rope == 8
    assert rt.cfg.n_dense_lead == 1 and rt.cfg.n_expert == 4

    toks = [3, 11, 25, 7, 42]
    with torch.no_grad():
        want = hf_model(torch.tensor([toks])).logits[0].float().numpy()
    got = deepseek2_forward(rt.params, rt.cfg, np.asarray([toks], np.int32))
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=3e-3, atol=3e-3)


def test_deepseek2_generate(ds2_gguf):
    from prima_tpu.models.deepseek2 import DeepseekV2Runtime

    dst, hf_model = ds2_gguf
    rt = DeepseekV2Runtime.load(dst)
    prompt = [3, 11, 25]
    out = rt.generate(prompt, n_predict=6)
    with torch.no_grad():
        hf_out = hf_model.generate(torch.tensor([prompt]), max_new_tokens=6,
                                   do_sample=False, pad_token_id=0)
    assert out == hf_out[0, len(prompt):].tolist()


def test_deepseek2_cli(ds2_gguf):
    import io
    import sys as _sys

    from prima_tpu.tools.cli import main as cli_main

    dst, _ = ds2_gguf
    old = _sys.stdout
    _sys.stdout = cap = io.StringIO()
    try:
        rc = cli_main(["-m", dst, "-p", "hello", "-n", "4",
                       "--no-display-prompt"])
    finally:
        _sys.stdout = old
    assert rc == 0 and len(cap.getvalue().strip()) > 0
