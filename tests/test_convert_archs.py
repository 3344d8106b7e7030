"""gemma / gemma2 / phi3 / mixtral: HF conversion + logit parity against
transformers (the multi-arch analogue of test_convert_hf.py)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_convert_hf import _write_tokenizer_json  # noqa: E402

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)


def _roundtrip(tmp_path, hf_cfg, model_cls, tokens, rtol=3e-4, atol=3e-4,
               expect_arch=None):
    import jax.numpy as jnp

    from prima_tpu.models.llama import ForwardOptions, forward, init_kv_caches
    from prima_tpu.models.loader import load_model
    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    d = str(tmp_path / "hf")
    os.makedirs(d, exist_ok=True)
    torch.manual_seed(0)
    model = model_cls(hf_cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    _write_tokenizer_json(d, hf_cfg.vocab_size)

    dst = str(tmp_path / "m.gguf")
    n = convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w"))
    assert n > 0
    lm = load_model(dst, dtype=jnp.float32)
    if expect_arch:
        assert lm.cfg.arch == expect_arch

    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].float().numpy()

    kv = init_kv_caches(lm.cfg, 1, 32, jnp.float32)
    pos = np.arange(len(tokens), dtype=np.int32)[None]
    got, _ = forward(lm.params, lm.cfg, np.asarray([tokens], np.int32), pos, kv,
                     np.zeros(1, np.int32),
                     ForwardOptions(matmul_impl="xla", dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=rtol, atol=atol)
    return lm


def test_gemma_parity(tmp_path):
    cfg = transformers.GemmaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-5,
        hidden_activation="gelu_pytorch_tanh",
    )
    lm = _roundtrip(tmp_path, cfg, transformers.GemmaForCausalLM,
                    [3, 77, 200, 5, 131], expect_arch="gemma")
    assert lm.cfg.act == "gelu"
    assert lm.cfg.embd_scale == pytest.approx(8.0)
    assert lm.cfg.tie_embeddings


def test_gemma2_parity(tmp_path):
    cfg = transformers.Gemma2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-5,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=8, query_pre_attn_scalar=16,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.Gemma2ForCausalLM,
                    [3, 77, 200, 5, 131, 44, 9, 250, 17, 61],
                    expect_arch="gemma2")
    assert lm.cfg.post_norms
    assert lm.cfg.swa_window == 8
    assert lm.cfg.attn_logit_softcap == 50.0


def test_phi3_parity(tmp_path):
    cfg = transformers.Phi3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.Phi3ForCausalLM,
                    [3, 77, 200, 5, 131], expect_arch="phi3")
    # fused qkv / gate_up were split at load time
    layer = lm.params["layers"][0]
    assert layer["wq"].shape[0] == 64 and layer["wk"].shape[0] == 32
    assert layer["w_gate"].shape[0] == 128 and layer["w_up"].shape[0] == 128


def test_mixtral_parity(tmp_path):
    cfg = transformers.MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.MixtralForCausalLM,
                    [3, 77, 200, 5, 131], expect_arch="llama")
    assert lm.cfg.n_expert == 4 and lm.cfg.n_expert_used == 2
    layer = lm.params["layers"][0]
    assert layer["ffn_gate_exps"].shape[0] == 4  # stacked expert axis


def test_mixtral_decode_single_token(tmp_path):
    """The decode path (b*s==1) uses dynamic expert gathers — its output
    must match the dense prefill path."""
    import jax.numpy as jnp

    from prima_tpu.models.llama import ForwardOptions, forward, init_kv_caches
    from prima_tpu.models.loader import load_model
    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    cfg = transformers.MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
    )
    d = str(tmp_path / "hf")
    os.makedirs(d, exist_ok=True)
    torch.manual_seed(1)
    model = transformers.MixtralForCausalLM(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    _write_tokenizer_json(d, cfg.vocab_size)
    dst = str(tmp_path / "m.gguf")
    convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w"))
    lm = load_model(dst, dtype=jnp.float32)
    opts = ForwardOptions(matmul_impl="xla", dtype=jnp.float32)

    toks = [3, 77, 200]
    # prefill all 3 (dense expert loop)
    kv = init_kv_caches(lm.cfg, 1, 32, jnp.float32)
    pos = np.arange(3, dtype=np.int32)[None]
    dense, _ = forward(lm.params, lm.cfg, np.asarray([toks], np.int32), pos,
                       kv, np.zeros(1, np.int32), opts)
    # prefill 2 then decode 1 (gather path)
    kv = init_kv_caches(lm.cfg, 1, 32, jnp.float32)
    _, kv = forward(lm.params, lm.cfg, np.asarray([toks[:2]], np.int32),
                    pos[:, :2], kv, np.zeros(1, np.int32), opts)
    one, _ = forward(lm.params, lm.cfg, np.asarray([[toks[2]]], np.int32),
                     np.asarray([[2]], np.int32), kv,
                     np.asarray([2], np.int32), opts)
    np.testing.assert_allclose(np.asarray(one[0, 0]), np.asarray(dense[0, 2]),
                               rtol=2e-4, atol=2e-4)


def test_mixtral_quantized_engine(tmp_path):
    """Quantized MoE: dynamic expert gathers over stacked QTensors under jit."""
    from prima_tpu.models.llama import ForwardOptions
    from prima_tpu.models.loader import load_model
    from prima_tpu.runtime.engine import Engine
    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    cfg = transformers.MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
    )
    d = str(tmp_path / "hf")
    os.makedirs(d, exist_ok=True)
    torch.manual_seed(2)
    transformers.MixtralForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    _write_tokenizer_json(d, cfg.vocab_size)
    dst = str(tmp_path / "q.gguf")
    convert_hf_to_gguf(d, dst, "Q8_0", logfile=open(os.devnull, "w"))
    lm = load_model(dst)
    from prima_tpu.quant.dequant_jax import QTensor

    assert isinstance(lm.params["layers"][0]["ffn_gate_exps"], QTensor)
    eng = Engine(lm.cfg, lm.params, n_slots=1, max_seq=64,
                 opts=ForwardOptions(matmul_impl="xla"))
    out = eng.run_to_completion([3, 77, 200], n_predict=4)
    assert len(out) == 4


def test_qwen2moe_parity(tmp_path):
    """qwen2moe: MoE with raw softmax router weights + sigmoid-gated shared
    expert (build_qwen2moe, src/llama.cpp:12918)."""
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, shared_expert_intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        rope_theta=10000.0, norm_topk_prob=False, max_position_embeddings=64,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.Qwen2MoeForCausalLM,
                    [3, 11, 25, 7], expect_arch="qwen2moe",
                    rtol=2e-3, atol=2e-3)
    assert lm.cfg.n_expert == 4 and not lm.cfg.moe_norm_w
    assert lm.params["layers"][0]["ffn_gate_inp_shexp"] is not None


def test_starcoder2_parity(tmp_path):
    """starcoder2: LayerNorm + biased projections + gateless GELU MLP
    (build_starcoder2, src/llama.cpp:14469)."""
    cfg = transformers.Starcoder2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        norm_epsilon=1e-5, use_bias=True, rope_theta=10000.0,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.Starcoder2ForCausalLM,
                    [3, 11, 25, 7], expect_arch="starcoder2",
                    rtol=2e-3, atol=2e-3)
    assert lm.cfg.norm_type == "ln" and not lm.cfg.ffn_gated
    assert lm.params["layers"][0].get("b_up") is not None


def test_olmo_parity(tmp_path):
    """olmo: non-parametric LayerNorm + q/k/v clamping (build_olmo,
    src/llama.cpp:14797)."""
    cfg = transformers.OlmoConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        clip_qkv=8.0, rope_theta=10000.0, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.OlmoForCausalLM,
                    [3, 11, 25, 7], expect_arch="olmo", rtol=2e-3, atol=2e-3)
    assert lm.cfg.norm_type == "ln" and lm.cfg.clamp_kqv == 8.0
    assert lm.params["layers"][0].get("attn_norm") is None


def test_command_r_parity(tmp_path):
    """command-r: parallel attn+ffn off one LayerNorm, scaled logits
    (build_command_r, src/llama.cpp:14642)."""
    cfg = transformers.CohereConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        layer_norm_eps=1e-5, logit_scale=0.25, rope_theta=10000.0,
        max_position_embeddings=64, use_qk_norm=False,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.CohereForCausalLM,
                    [3, 11, 25, 7], expect_arch="command-r",
                    rtol=2e-3, atol=2e-3)
    assert lm.cfg.parallel_block and lm.cfg.logit_scale == 0.25


def test_phi2_parity(tmp_path):
    """phi2: LayerNorm+bias, parallel attn+MLP off one norm, partial rope,
    biased lm_head (build_phi2, src/llama.cpp:13064)."""
    cfg = transformers.PhiConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, layer_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.PhiForCausalLM,
                    [3, 11, 25, 7], expect_arch="phi2", rtol=2e-3, atol=2e-3)
    assert lm.cfg.parallel_block and not lm.cfg.ffn_gated
    assert lm.cfg.rope_dim == 8  # 0.5 * head_dim 16
    assert lm.params.get("output_b") is not None


def test_stablelm_parity(tmp_path):
    """stablelm: LayerNorm+bias norms, partial rope, qkv bias
    (build_stablelm)."""
    cfg = transformers.StableLmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.25, layer_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=64, use_qkv_bias=True,
        use_parallel_residual=False, tie_word_embeddings=False,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.StableLmForCausalLM,
                    [3, 11, 25, 7], expect_arch="stablelm",
                    rtol=2e-3, atol=2e-3)
    assert lm.cfg.norm_type == "ln" and lm.cfg.rope_dim == 4
    assert lm.params["layers"][0].get("bq") is not None


@pytest.mark.parametrize("parallel", [True, False], ids=["parallel", "seq"])
def test_gptneox_parity(tmp_path, parallel):
    """gptneox: interleaved fused QKV (de-interleaved at conversion), LN+bias,
    gateless GELU MLP, optional parallel residual with its own ffn_norm
    (build_gptneox)."""
    cfg = transformers.GPTNeoXConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        layer_norm_eps=1e-5, rotary_emb_base=10000,
        max_position_embeddings=64, use_parallel_residual=parallel,
        tie_word_embeddings=False,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.GPTNeoXForCausalLM,
                    [3, 11, 25, 7], expect_arch="gptneox",
                    rtol=2e-3, atol=2e-3)
    assert lm.cfg.parallel_block == parallel and lm.cfg.rope_dim == 4


@pytest.mark.parametrize("new_arch", [True, False], ids=["multiquery", "mha"])
def test_falcon_parity(tmp_path, new_arch):
    """falcon: fused multi-query QKV ('jploski' reorder at conversion),
    LayerNorm+bias, parallel attn+MLP (build_falcon)."""
    cfg = transformers.FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2 if new_arch else 4,
        new_decoder_architecture=new_arch, multi_query=new_arch,
        parallel_attn=True, bias=False, layer_norm_epsilon=1e-5,
        rope_theta=10000.0, max_position_embeddings=64, alibi=False,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.FalconForCausalLM,
                    [3, 11, 25, 7], expect_arch="falcon",
                    rtol=2e-3, atol=2e-3)
    assert lm.cfg.parallel_block and lm.cfg.norm_type == "ln"
    if new_arch:
        assert lm.params["layers"][0].get("ffn_norm") is not None


def test_gpt2_parity(tmp_path):
    """gpt2: learned position embeddings, Conv1D-transposed fused qkv,
    LN+bias, no rope (build_gpt2, src/llama.cpp:13417)."""
    cfg = transformers.GPT2Config(
        vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        layer_norm_epsilon=1e-5, tie_word_embeddings=True,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.GPT2LMHeadModel,
                    [3, 11, 25, 7], expect_arch="gpt2", rtol=2e-3, atol=2e-3)
    assert lm.cfg.pos_embd and lm.cfg.rope_dim == 0
    assert lm.params.get("pos_embd") is not None


def test_starcoder_parity(tmp_path):
    """starcoder v1 (GPTBigCode): multi-query (n_kv=1) fused qkv, learned
    positions (build_starcoder)."""
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        multi_query=True, layer_norm_epsilon=1e-5,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.GPTBigCodeForCausalLM,
                    [3, 11, 25, 7], expect_arch="starcoder",
                    rtol=2e-3, atol=2e-3)
    assert lm.cfg.n_kv_heads == 1 and lm.cfg.pos_embd


def test_granite_parity(tmp_path):
    """granite: llama with embedding/residual/attention/logits multipliers
    (LLM_ARCH_GRANITE, src/llama.cpp:6556)."""
    cfg = transformers.GraniteConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        embedding_multiplier=6.0, residual_multiplier=0.5,
        attention_multiplier=0.1, logits_scaling=4.0,
        rope_theta=10000.0, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.GraniteForCausalLM,
                    [3, 11, 25, 7], expect_arch="granite",
                    rtol=2e-3, atol=2e-3)
    assert lm.cfg.embd_scale == 6.0 and lm.cfg.residual_scale == 0.5
    assert lm.cfg.logit_scale == 0.25
    assert abs(lm.cfg.attn_scale - 0.1) < 1e-6


def test_nemotron_parity(tmp_path):
    """nemotron: layernorm1p (+1 folded into weights at conversion),
    squared-ReLU MLP, partial rope (build_nemotron)."""
    cfg = transformers.NemotronConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.NemotronForCausalLM,
                    [3, 11, 25, 7], expect_arch="nemotron",
                    rtol=2e-3, atol=2e-3)
    assert lm.cfg.act == "relu2" and lm.cfg.rope_dim == 8


def test_olmoe_parity(tmp_path):
    """olmoe: full-vector q/k RMS norms + MoE with raw softmax router
    weights (build_olmoe)."""
    cfg = transformers.OlmoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        rope_theta=10000.0, max_position_embeddings=64,
        tie_word_embeddings=False, rms_norm_eps=1e-5,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.OlmoeForCausalLM,
                    [3, 11, 25, 7], expect_arch="olmoe", rtol=2e-3, atol=2e-3)
    assert lm.cfg.n_expert == 4 and not lm.cfg.moe_norm_w
    assert lm.params["layers"][0].get("attn_q_norm") is not None


def test_bloom_parity(tmp_path):
    """bloom: ALiBi attention, embedding LayerNorm, per-head-interleaved
    fused qkv de-interleaved at conversion (build_bloom)."""
    cfg = transformers.BloomConfig(
        vocab_size=128, hidden_size=64, n_layer=2, n_head=4,
        layer_norm_epsilon=1e-5, tie_word_embeddings=True,
        attention_dropout=0.0, hidden_dropout=0.0,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.BloomForCausalLM,
                    [3, 11, 25, 7], expect_arch="bloom", rtol=2e-3, atol=2e-3)
    assert lm.cfg.alibi_max_bias == 8.0 and lm.cfg.rope_dim == 0
    assert lm.params.get("tok_embd_norm") is not None


def test_mpt_parity(tmp_path):
    """mpt: ALiBi, bias-free LayerNorms, contiguous fused qkv (build_mpt)."""
    cfg = transformers.MptConfig(
        vocab_size=128, d_model=64, n_layers=2, n_heads=4,
        attn_config=transformers.models.mpt.configuration_mpt.MptAttentionConfig(
            alibi=True, alibi_bias_max=8, attn_pdrop=0.0, clip_qkv=None),
        tie_word_embeddings=True, no_bias=True, expansion_ratio=4,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.MptForCausalLM,
                    [3, 11, 25, 7], expect_arch="mpt", rtol=2e-3, atol=2e-3)
    assert lm.cfg.alibi_max_bias == 8.0 and lm.cfg.rope_dim == 0


def test_gptj_parity(tmp_path):
    """gptj: parallel attn+MLP off one LayerNorm, partial interleaved
    rotary, biased lm_head (build_gptj)."""
    cfg = transformers.GPTJConfig(
        vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        rotary_dim=8, layer_norm_epsilon=1e-5, tie_word_embeddings=False,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.GPTJForCausalLM,
                    [3, 11, 25, 7], expect_arch="gptj", rtol=2e-3, atol=2e-3)
    assert lm.cfg.parallel_block and lm.cfg.rope_dim == 8
    assert lm.params.get("output_b") is not None


def test_dbrx_parity(tmp_path):
    """dbrx: fused clamped qkv, LayerNorm without bias, MoE with fused
    expert tensors and normalized top-k weights (build_dbrx)."""
    cfg = transformers.DbrxConfig(
        vocab_size=128, d_model=64, n_layers=2, n_heads=4, max_seq_len=64,
        attn_config=transformers.models.dbrx.configuration_dbrx.DbrxAttentionConfig(
            clip_qkv=8.0, kv_n_heads=2, rope_theta=10000.0, attn_pdrop=0.0),
        ffn_config=transformers.models.dbrx.configuration_dbrx.DbrxFFNConfig(
            ffn_hidden_size=48, moe_num_experts=4, moe_top_k=2,
            moe_normalize_expert_weights=1.0, moe_jitter_eps=None),
        resid_pdrop=0.0, emb_pdrop=0.0, tie_word_embeddings=False,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.DbrxForCausalLM,
                    [3, 11, 25, 7], expect_arch="dbrx", rtol=2e-3, atol=2e-3)
    assert lm.cfg.n_expert == 4 and lm.cfg.clamp_kqv == 8.0
    assert lm.cfg.moe_norm_w and lm.cfg.norm_type == "ln"


def test_granitemoe_parity(tmp_path):
    """granitemoe: granite's scale knobs + MoE with fused gate|up expert
    tensors split at conversion (LLM_ARCH_GRANITE_MOE)."""
    cfg = transformers.GraniteMoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=6.0, residual_multiplier=0.5,
        attention_multiplier=0.1, logits_scaling=4.0,
        rope_theta=10000.0, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    lm = _roundtrip(tmp_path, cfg, transformers.GraniteMoeForCausalLM,
                    [3, 11, 25, 7], expect_arch="granitemoe",
                    rtol=2e-3, atol=2e-3)
    assert lm.cfg.n_expert == 4 and lm.cfg.embd_scale == 6.0


@pytest.mark.parametrize("family", ["gpt2", "bloom", "falcon", "stablelm",
                                    "gptneox", "mpt"])
def test_engine_greedy_matches_hf_generate(tmp_path, family):
    """Incremental Engine decode (KV cache, learned-pos / ALiBi paths) must
    reproduce HF greedy generation token-for-token."""
    import jax.numpy as jnp

    from prima_tpu.models.llama import ForwardOptions
    from prima_tpu.models.loader import load_model
    from prima_tpu.runtime.engine import Engine
    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    if family == "gpt2":
        cfg = transformers.GPT2Config(
            vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4,
            attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
        model = transformers.GPT2LMHeadModel
    elif family == "bloom":
        cfg = transformers.BloomConfig(
            vocab_size=128, hidden_size=64, n_layer=2, n_head=4,
            attention_dropout=0.0, hidden_dropout=0.0)
        model = transformers.BloomForCausalLM
    elif family == "falcon":
        cfg = transformers.FalconConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_kv_heads=2,
            new_decoder_architecture=True, multi_query=True,
            parallel_attn=True, bias=False, alibi=False,
            rope_theta=10000.0, max_position_embeddings=64)
        model = transformers.FalconForCausalLM
    elif family == "stablelm":
        cfg = transformers.StableLmConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            partial_rotary_factor=0.25, use_qkv_bias=True,
            use_parallel_residual=False, rope_theta=10000.0,
            max_position_embeddings=64, tie_word_embeddings=False)
        model = transformers.StableLmForCausalLM
    elif family == "gptneox":
        cfg = transformers.GPTNeoXConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
            use_parallel_residual=True, rotary_emb_base=10000,
            max_position_embeddings=64, tie_word_embeddings=False)
        model = transformers.GPTNeoXForCausalLM
    else:
        cfg = transformers.MptConfig(
            vocab_size=128, d_model=64, n_layers=2, n_heads=4,
            attn_config=transformers.models.mpt.configuration_mpt
            .MptAttentionConfig(alibi=True, alibi_bias_max=8,
                                attn_pdrop=0.0, clip_qkv=None),
            tie_word_embeddings=True, no_bias=True, expansion_ratio=4)
        model = transformers.MptForCausalLM

    d = str(tmp_path / "hf")
    os.makedirs(d, exist_ok=True)
    torch.manual_seed(0)
    hf = model(cfg)
    hf.eval()
    hf.save_pretrained(d, safe_serialization=True)
    _write_tokenizer_json(d, cfg.vocab_size)
    dst = str(tmp_path / "m.gguf")
    convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w"))

    lm = load_model(dst, dtype=jnp.float32)
    eng = Engine(lm.cfg, lm.params, n_slots=1, max_seq=48,
                 opts=ForwardOptions(matmul_impl="xla", dtype=jnp.float32,
                                     logits_dtype=jnp.float32))
    prompt = [3, 11, 25, 7]
    got = eng.run_to_completion(prompt, n_predict=8)
    with torch.no_grad():
        want = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                           do_sample=False, pad_token_id=0)
    assert got == want[0, len(prompt):].tolist()
