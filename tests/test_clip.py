"""CLIP vision encoder + llava projector vs transformers CLIPVisionModel
(the clip.cpp analogue; reference examples/llava/clip.cpp)."""

import numpy as np
import pytest

pytest.importorskip("transformers")


def _np_gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(
        0.7978845608028654 * (x + 0.044715 * x ** 3)))


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(11)
    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=48, num_hidden_layers=4,
        num_attention_heads=4, image_size=32, patch_size=8,
        projection_dim=16)
    vm = CLIPVisionModel(cfg).eval()
    rng = np.random.default_rng(5)
    proj = {
        "mm.0.weight": rng.standard_normal((16, 32)).astype(np.float32) * 0.1,
        "mm.0.bias": rng.standard_normal(16).astype(np.float32) * 0.1,
        "mm.2.weight": rng.standard_normal((24, 16)).astype(np.float32) * 0.1,
        "mm.2.bias": rng.standard_normal(24).astype(np.float32) * 0.1,
    }
    path = str(tmp_path_factory.mktemp("clip") / "mmproj.gguf")
    from prima_tpu.tools.convert_image_encoder import convert

    convert(vm, path, projector=proj)
    return vm, proj, path


def test_encoder_parity_vs_transformers(tiny_clip):
    """Our (block_count-1)-layer forward must match transformers'
    hidden_states at the same depth, then the projector output."""
    import torch

    vm, proj, path = tiny_clip
    from prima_tpu.models.clip import ClipModel, clip_encode_image

    cm = ClipModel.load(path)
    assert cm.cfg.n_layers == 3  # n_hf - 1 (reference converter semantics)
    n_run = cm.cfg.n_layers - 1  # layers the graph executes (clip.cpp:682)

    rng = np.random.default_rng(3)
    px = rng.standard_normal((3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        out = vm(torch.from_numpy(px[None]), output_hidden_states=True)
    feats = out.hidden_states[n_run][0].numpy()  # after n_run layers
    feats = feats[1:]  # drop class token
    want = _np_gelu_tanh(feats @ proj["mm.0.weight"].T + proj["mm.0.bias"])
    want = want @ proj["mm.2.weight"].T + proj["mm.2.bias"]

    got = np.asarray(clip_encode_image(cm.params, cm.cfg, px), np.float32)
    assert got.shape == (cm.cfg.n_patches, 24)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_preprocess_pad_and_normalize():
    from prima_tpu.models.clip import (ClipVisionConfig, PAD_COLOR,
                                       preprocess_image)

    cfg = ClipVisionConfig(
        image_size=32, patch_size=8, n_embd=32, n_ff=48, n_layers=3,
        n_heads=4, eps=1e-5, proj_dim=16, use_gelu=False,
        projector_type="mlp")
    img = np.full((16, 32, 3), 200, np.uint8)  # wide image -> pad bottom
    x = preprocess_image(img, cfg)
    assert x.shape == (3, 32, 32)
    # bottom half comes from the pad color
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    pad = (np.asarray(PAD_COLOR, np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(x[:, -8:, :].mean(axis=(1, 2)), pad, atol=0.02)
    top = (200.0 / 255.0 - mean) / std
    np.testing.assert_allclose(x[:, :8, :].mean(axis=(1, 2)), top, atol=0.02)


def test_rejects_unsupported_projector(tiny_clip, tmp_path):
    from prima_tpu.gguf.reader import GGUFModel
    from prima_tpu.gguf.writer import GGUFWriter
    from prima_tpu.models.clip import ClipVisionConfig

    path = str(tmp_path / "bad.gguf")
    w = GGUFWriter(path, arch="clip")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type", "ldp")
    w.add_tensor("dummy", np.zeros(4, np.float32))
    w.write()
    m = GGUFModel.open(path)
    with pytest.raises(NotImplementedError):
        ClipVisionConfig.from_gguf(m)
    m.close()
