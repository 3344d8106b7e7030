"""llava multimodal path: embedding splicing correctness + CLI e2e
(reference examples/llava/llava-cli.cpp + llava.cpp)."""

import io
import sys

import numpy as np
import pytest

from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)


@pytest.fixture(scope="module")
def tiny_llm(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    return make_tiny_gguf(path, seed=3)


def test_embed_splice_equals_token_decode(tiny_llm):
    """Feeding token EMBEDDINGS through the splice path must generate the
    same tokens as feeding the token IDS — validates inputs_embeds + the
    chunked eval loop against the engine."""
    from prima_tpu.models.loader import load_model
    from prima_tpu.models.llama import ForwardOptions
    from prima_tpu.runtime.engine import Engine
    from prima_tpu.sampling import Sampler, SamplerParams
    from prima_tpu.tools.llava_cli import LlavaRuntime

    model = load_model(tiny_llm)
    pre = model.tokenizer.encode("USER: ", add_special=True)
    mid = model.tokenizer.encode("xy", add_special=False)
    post = model.tokenizer.encode(" ASSISTANT:", add_special=False)

    plain = Engine(model.cfg, model.params, n_slots=1, max_seq=128,
                   opts=ForwardOptions(matmul_impl="xla"),
                   eog_ids=model.eog_ids)
    want = plain.run_to_completion(pre + mid + post, n_predict=8)

    rt = LlavaRuntime(model, max_seq=128, matmul_impl="xla")
    rt.eval_tokens(pre)
    rt.eval_embeds(rt._embed_tokens(mid))  # "image" = token embeddings
    logits = rt.eval_tokens(post)
    got = rt.generate(Sampler(SamplerParams(temp=0.0)), 8, logits,
                      model.eog_ids)
    assert got == want


def _mmproj(tmp_path, llm_embd=256):
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from prima_tpu.tools.convert_image_encoder import convert

    torch.manual_seed(7)
    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=32, patch_size=8, projection_dim=16)
    vm = CLIPVisionModel(cfg).eval()
    rng = np.random.default_rng(9)
    proj = {
        "mm.0.weight": rng.standard_normal((64, 32)).astype(np.float32) * 0.1,
        "mm.0.bias": np.zeros(64, np.float32),
        "mm.2.weight": rng.standard_normal(
            (llm_embd, 64)).astype(np.float32) * 0.02,
        "mm.2.bias": np.zeros(llm_embd, np.float32),
    }
    path = str(tmp_path / "mmproj.gguf")
    convert(vm, path, projector=proj)
    return path


def test_llava_cli_e2e(tiny_llm, tmp_path):
    from prima_tpu.tools.llava_cli import main

    mmproj = _mmproj(tmp_path)
    rng = np.random.default_rng(4)
    img_a = str(tmp_path / "a.npy")
    img_b = str(tmp_path / "b.npy")
    np.save(img_a, rng.integers(0, 255, (40, 24, 3), dtype=np.uint8))
    np.save(img_b, rng.integers(0, 255, (24, 40, 3), dtype=np.uint8))

    def run(image):
        old = sys.stdout
        sys.stdout = cap = io.StringIO()
        try:
            rc = main(["-m", tiny_llm, "--mmproj", mmproj, "--image", image,
                       "-p", "what is this?", "-n", "6", "--temp", "0",
                       "--matmul", "xla", "-c", "128"])
        finally:
            sys.stdout = old
        assert rc == 0
        return cap.getvalue().strip()

    out_a = run(img_a)
    assert len(out_a) > 0
    assert run(img_a) == out_a  # deterministic
    # marker/arg count mismatch is rejected
    old = sys.stdout
    sys.stdout = io.StringIO()
    try:
        rc = main(["-m", tiny_llm, "--mmproj", mmproj, "--image", img_a,
                   "--image", img_b, "-p", "one <image> only",
                   "--matmul", "xla"])
    finally:
        sys.stdout = old
    assert rc == 1
