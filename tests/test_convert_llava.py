"""Full LLaVA HF checkpoint -> (language GGUF + mmproj GGUF) conversion
with end-to-end image+text logit parity against transformers."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_convert_hf import _write_tokenizer_json  # noqa: E402

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

VOCAB, EMBD, VIS_H, N_IMG_TOK = 512, 64, 32, 16  # 32/8 -> 4x4 patches


@pytest.fixture(scope="module")
def llava_checkpoint(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("llava"))
    vision = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=48, num_hidden_layers=4,
        num_attention_heads=4, image_size=VIS_H, patch_size=8,
        projection_dim=16)
    text = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=EMBD, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    # vision_feature_layer=-3 matches the reference pipeline's depth:
    # the mmproj converter writes block_count = n-1 and clip.cpp runs
    # block_count-1 layers (a long-standing upstream composition we
    # reproduce bit-for-bit), which equals hidden_states[n-2] == -3
    cfg = transformers.LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=VOCAB - 1,
        vision_feature_layer=-3, vision_feature_select_strategy="default")
    torch.manual_seed(3)
    model = transformers.LlavaForConditionalGeneration(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    _write_tokenizer_json(d, VOCAB)
    return d, model


def test_llava_conversion_and_logit_parity(llava_checkpoint, tmp_path):
    src, hfmodel = llava_checkpoint
    dst = str(tmp_path / "llava.gguf")
    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    with open(os.path.join(src, "config.json")) as f:
        hf = json.load(f)
    n = convert_hf_to_gguf(src, dst, "F32")
    assert n > 0
    mmproj = str(tmp_path / "mmproj-llava.gguf")
    assert os.path.exists(mmproj)

    from prima_tpu.models.clip import ClipModel, clip_encode_image
    from prima_tpu.models.loader import load_model
    from prima_tpu.tools.llava_cli import LlavaRuntime

    model = load_model(dst, dtype=np.float32)
    clip = ClipModel.load(mmproj)
    assert clip.cfg.n_layers == 3  # n_hf - 1

    rng = np.random.default_rng(11)
    px = rng.standard_normal((3, VIS_H, VIS_H)).astype(np.float32)
    pre = [5, 17]
    post = [9, 33, 2]
    img_tok = hf["image_token_index"]
    input_ids = pre + [img_tok] * N_IMG_TOK + post

    with torch.no_grad():
        out = hfmodel(input_ids=torch.tensor([input_ids]),
                      pixel_values=torch.from_numpy(px[None]),
                      attention_mask=torch.ones(1, len(input_ids),
                                                dtype=torch.long))
    want = out.logits[0, -1].numpy()

    emb = np.asarray(clip_encode_image(clip.params, clip.cfg, px),
                     np.float32)
    assert emb.shape == (N_IMG_TOK, EMBD)
    rt = LlavaRuntime(model, max_seq=64, matmul_impl="xla")
    import jax.numpy as jnp

    rt.kv = [tuple(c.astype(jnp.float32) for c in kv) for kv in rt.kv]
    rt.eval_tokens(pre)
    rt.eval_embeds(emb)
    got = rt.eval_tokens(post)

    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    # the argmax (greedy continuation) must agree exactly
    assert int(np.argmax(got)) == int(np.argmax(want))
