"""CLIP vision encoder + llava projector vs transformers CLIPVisionModel
(the clip.cpp analogue; reference examples/llava/clip.cpp)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

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
    w.add_kv("clip.projector_type", "adapter_xyz")  # unknown type
    w.add_tensor("dummy", np.zeros(4, np.float32))
    w.write()
    m = GGUFModel.open(path)
    with pytest.raises(NotImplementedError):
        ClipVisionConfig.from_gguf(m)
    m.close()


def test_anyres_selection_and_merge():
    from prima_tpu.models.clip import (anyres_tiles, ClipVisionConfig,
                                       merge_anyres_embeds,
                                       select_best_resolution)

    # 2:1-wide image prefers the 64x32 pinpoint over 32x64 / 32x32
    assert select_best_resolution((100, 50),
                                  [(32, 32), (64, 32), (32, 64)]) == (64, 32)

    cfg = ClipVisionConfig(
        image_size=32, patch_size=8, n_embd=32, n_ff=48, n_layers=3,
        n_heads=4, eps=1e-5, proj_dim=16, use_gelu=False,
        projector_type="mlp", mm_patch_merge_type="spatial_unpad",
        grid_pinpoints=(32, 32, 64, 32, 32, 64, 64, 64))
    img = np.random.default_rng(2).integers(
        0, 255, (50, 100, 3), dtype=np.uint8)
    tiles, grid = anyres_tiles(img, cfg)
    assert grid == (2, 1)
    assert len(tiles) == 1 + 2  # base + 2x1 grid
    assert all(t.shape == (32, 32, 3) for t in tiles)

    # merge: grid tiles interleave at patch-row granularity
    s, d = 4, 3  # n_side=4 patches per tile side
    base = np.zeros((s * s, d), np.float32)
    t0 = np.arange(s * s * d, dtype=np.float32).reshape(s * s, d)
    t1 = t0 + 1000
    out = merge_anyres_embeds([base, t0, t1], (2, 1), s)
    assert out.shape == (3 * s * s, d)
    merged = out[s * s:].reshape(s, 2 * s, d)  # (rows, cols, d)
    # row r: first s cols from tile0's row r, next s from tile1's row r
    np.testing.assert_array_equal(merged[1, :s], t0.reshape(s, s, d)[1])
    np.testing.assert_array_equal(merged[1, s:], t1.reshape(s, s, d)[1])


def test_anyres_e2e_encode(tiny_clip, tmp_path):
    """An anyres mmproj encodes to base+grid rows; matches per-tile
    encodes merged by the documented layout."""
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from prima_tpu.models.clip import ClipModel, clip_encode_image
    from prima_tpu.tools.convert_image_encoder import convert

    torch.manual_seed(21)
    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=32, patch_size=8, projection_dim=16)
    vm = CLIPVisionModel(cfg).eval()
    rng = np.random.default_rng(6)
    proj = {
        "mm.0.weight": rng.standard_normal((16, 32)).astype(np.float32) * .1,
        "mm.0.bias": np.zeros(16, np.float32),
        "mm.2.weight": rng.standard_normal((24, 16)).astype(np.float32) * .1,
        "mm.2.bias": np.zeros(24, np.float32),
    }
    path = str(tmp_path / "mmproj16.gguf")
    convert(vm, path, projector=proj,
            image_grid_pinpoints=[(32, 32), (64, 32), (32, 64)],
            mm_patch_merge_type="spatial_unpad")
    cm = ClipModel.load(path)
    assert cm.cfg.grid_pinpoints == (32, 32, 64, 32, 32, 64)
    img = rng.integers(0, 255, (40, 90, 3), dtype=np.uint8)
    out = cm.encode(img)
    # base (16 patches) + 2x1 grid (32 patches)
    assert out.shape == (16 + 32, 24)
    assert np.isfinite(out).all()


def _torch_ldp(params, x, n_side, eps=1e-5):
    """Independent torch implementation of the MobileVLM LDP projector
    (depthwise conv + channel LN + hardswish + SE + pointwise + LN)."""
    import torch
    import torch.nn.functional as F

    t = lambda k: torch.from_numpy(np.asarray(params[k]))  # noqa: E731
    h = torch.from_numpy(x)
    h = F.gelu(h @ t("mm.model.mlp.1.weight").T + t("mm.model.mlp.1.bias"),
               approximate="tanh")
    h = h @ t("mm.model.mlp.3.weight").T + t("mm.model.mlp.3.bias")
    c = h.shape[-1]
    g = h.reshape(n_side, n_side, c).permute(2, 0, 1)[None]  # (1,C,H,W)

    def block(g, pre, stride, residual):
        src = g
        g = F.conv2d(g, t(f"{pre}.0.0.weight"), stride=stride, padding=1,
                     groups=c)
        g = F.layer_norm(g.permute(0, 2, 3, 1), (c,),
                         t(f"{pre}.0.1.weight"), t(f"{pre}.0.1.bias"),
                         eps).permute(0, 3, 1, 2)
        g = F.hardswish(g)
        se = g.mean(dim=(2, 3))
        se = F.relu(se @ t(f"{pre}.1.fc1.weight").T + t(f"{pre}.1.fc1.bias"))
        se = F.hardsigmoid(se @ t(f"{pre}.1.fc2.weight").T
                           + t(f"{pre}.1.fc2.bias"))
        g = g * se[:, :, None, None]
        hw = g.shape[2] * g.shape[3]
        flat = g.permute(0, 2, 3, 1).reshape(hw, c)
        flat = flat @ t(f"{pre}.2.0.weight").T
        flat = F.layer_norm(flat, (c,), t(f"{pre}.2.1.weight"),
                            t(f"{pre}.2.1.bias"), eps)
        g = flat.reshape(1, g.shape[2], g.shape[3], c).permute(0, 3, 1, 2)
        return g + src if residual else g

    g = block(g, "mm.model.mb_block.1.block", 1, True)
    g = block(g, "mm.model.mb_block.2.block", 2, False)
    return g[0].permute(1, 2, 0).reshape(-1, c).numpy()


def _rand_ldp_params(rng, vis, c):
    p = {
        "mm.model.mlp.1.weight": rng.standard_normal((c, vis)).astype(np.float32) * .1,
        "mm.model.mlp.1.bias": rng.standard_normal(c).astype(np.float32) * .1,
        "mm.model.mlp.3.weight": rng.standard_normal((c, c)).astype(np.float32) * .1,
        "mm.model.mlp.3.bias": rng.standard_normal(c).astype(np.float32) * .1,
    }
    for b in (1, 2):
        pre = f"mm.model.mb_block.{b}.block"
        p[f"{pre}.0.0.weight"] = rng.standard_normal((c, 1, 3, 3)).astype(np.float32) * .2
        p[f"{pre}.0.1.weight"] = 1 + rng.standard_normal(c).astype(np.float32) * .05
        p[f"{pre}.0.1.bias"] = rng.standard_normal(c).astype(np.float32) * .05
        p[f"{pre}.1.fc1.weight"] = rng.standard_normal((c // 4, c)).astype(np.float32) * .1
        p[f"{pre}.1.fc1.bias"] = rng.standard_normal(c // 4).astype(np.float32) * .1
        p[f"{pre}.1.fc2.weight"] = rng.standard_normal((c, c // 4)).astype(np.float32) * .1
        p[f"{pre}.1.fc2.bias"] = rng.standard_normal(c).astype(np.float32) * .1
        p[f"{pre}.2.0.weight"] = rng.standard_normal((c, c)).astype(np.float32) * .1
        p[f"{pre}.2.1.weight"] = 1 + rng.standard_normal(c).astype(np.float32) * .05
        p[f"{pre}.2.1.bias"] = rng.standard_normal(c).astype(np.float32) * .05
    return p


def test_ldp_projector_vs_torch():
    from prima_tpu.models.clip import ClipVisionConfig, apply_projector

    rng = np.random.default_rng(13)
    vis, c, n_side = 24, 32, 4
    cfg = ClipVisionConfig(
        image_size=32, patch_size=8, n_embd=vis, n_ff=48, n_layers=3,
        n_heads=4, eps=1e-5, proj_dim=c, use_gelu=False,
        projector_type="ldp")
    p = _rand_ldp_params(rng, vis, c)
    x = rng.standard_normal((n_side * n_side, vis)).astype(np.float32)
    got = np.asarray(apply_projector(p, cfg, x))
    want = _torch_ldp(p, x, n_side)
    assert got.shape == ((n_side // 2) ** 2, c)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ldpv2_projector_vs_torch():
    import torch
    import torch.nn.functional as F

    from prima_tpu.models.clip import ClipVisionConfig, apply_projector

    rng = np.random.default_rng(14)
    vis, c, n_side = 24, 32, 4
    cfg = ClipVisionConfig(
        image_size=32, patch_size=8, n_embd=vis, n_ff=48, n_layers=3,
        n_heads=4, eps=1e-5, proj_dim=c, use_gelu=False,
        projector_type="ldpv2")
    p = {
        "mm.model.mlp.0.weight": rng.standard_normal((c, vis)).astype(np.float32) * .1,
        "mm.model.mlp.0.bias": rng.standard_normal(c).astype(np.float32) * .1,
        "mm.model.mlp.2.weight": rng.standard_normal((c, c)).astype(np.float32) * .1,
        "mm.model.mlp.2.bias": rng.standard_normal(c).astype(np.float32) * .1,
        "mm.model.peg.0.weight": rng.standard_normal((c, 1, 3, 3)).astype(np.float32) * .2,
        "mm.model.peg.0.bias": rng.standard_normal(c).astype(np.float32) * .1,
    }
    x = rng.standard_normal((n_side * n_side, vis)).astype(np.float32)
    got = np.asarray(apply_projector(p, cfg, x))

    t = lambda k: torch.from_numpy(np.asarray(p[k]))  # noqa: E731
    h = torch.from_numpy(x)
    h = F.gelu(h @ t("mm.model.mlp.0.weight").T + t("mm.model.mlp.0.bias"),
               approximate="tanh")
    h = h @ t("mm.model.mlp.2.weight").T + t("mm.model.mlp.2.bias")
    g = h.reshape(n_side, n_side, c).permute(2, 0, 1)[None]
    g = F.avg_pool2d(g, 2, 2)
    peg = F.conv2d(g, t("mm.model.peg.0.weight"), stride=1, padding=1,
                   groups=c)
    want = (peg[0].permute(1, 2, 0) + t("mm.model.peg.0.bias")
            + g[0].permute(1, 2, 0)).reshape(-1, c).numpy()
    assert got.shape == ((n_side // 2) ** 2, c)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
