"""minicpmv vision path: 2D sincos table, bucket positions, uhd slicing,
perceiver resampler (reference examples/llava/clip.cpp resampler +
minicpmv-cli.cpp)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)

from prima_tpu.models.clip import (ClipVisionConfig, _resampler,
                                   bucket_position_ids,
                                   get_2d_sincos_pos_embed, uhd_best_grid,
                                   uhd_slice_image)


def test_sincos_matches_reference_loops():
    """Literal reimplementation of get_2d_sincos_pos_embed
    (clip.cpp:2198-2282) with scalar loops."""
    dim, pos_w, pos_h = 16, 3, 2
    got = get_2d_sincos_pos_embed(dim, pos_w, pos_h)

    half, quarter = dim // 2, dim // 4
    omega = [1.0 / 10000.0 ** (i / quarter) for i in range(quarter)]

    def emb1d(p):
        out = [0.0] * half
        for d in range(quarter):
            out[d] = np.sin(p * omega[d])
            out[d + quarter] = np.cos(p * omega[d])
        return out

    want = np.zeros((pos_w * pos_h, dim), np.float32)
    for h in range(pos_w):       # grid index over image_size.first = pos_w
        for w in range(pos_h):   # grid index over image_size.second
            row = emb1d(float(h)) + emb1d(float(w))
            want[w * pos_w + h] = row  # pos_embed_2d[w * H + h]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_bucket_position_ids():
    ids = bucket_position_ids(2, 3)  # 2 rows x 3 cols
    assert ids.shape == (6,)
    # floor(70*i/n): rows -> {0, 35}, cols -> {0, 23, 46}
    np.testing.assert_array_equal(
        ids.reshape(2, 3),
        [[0, 23, 46], [35 * 70, 35 * 70 + 23, 35 * 70 + 46]])


def test_uhd_slice_small_image_single_tile():
    img = np.zeros((100, 200, 3), np.uint8)
    tiles, grid = uhd_slice_image(img, patch_size=14)
    assert grid == (1, 1) and len(tiles) == 1
    th, tw = tiles[0].shape[:2]
    assert th % 14 == 0 and tw % 14 == 0


def test_uhd_slice_large_image_grid():
    img = np.zeros((700, 1400, 3), np.uint8)  # 2:1, ~5x scale_resolution^2
    tiles, (gw, gh) = uhd_slice_image(img, patch_size=14)
    assert gw * gh >= 2 and len(tiles) == 1 + gw * gh
    assert gw > gh  # grid follows the aspect ratio (log-ratio match)
    for t in tiles:
        assert t.shape[0] % 14 == 0 and t.shape[1] % 14 == 0
    # 2:1 with multiple=5 -> candidates {4,5,6}; (3,2) has the smallest
    # |log(2) - log(gx/gy)|
    assert uhd_best_grid(9, 5, np.log(2.0)) == (3, 2)


def _rand_resampler_params(rng, vis, hidden, out, num_query):
    def r(*s, scale=0.1):
        return rng.standard_normal(s).astype(np.float32) * scale

    p = {"resampler.query": r(num_query, hidden),
         "resampler.kv.weight": r(hidden, vis),
         "resampler.proj.weight": r(out, hidden)}
    for n in ("q", "k", "v", "out"):
        p[f"resampler.attn.{n}.weight"] = r(hidden, hidden)
        p[f"resampler.attn.{n}.bias"] = r(hidden)
    for n in ("q", "kv", "post"):
        p[f"resampler.ln_{n}.weight"] = 1 + r(hidden, scale=0.05)
        p[f"resampler.ln_{n}.bias"] = r(hidden, scale=0.05)
    return p


def test_resampler_vs_torch():
    """Independent torch implementation of the perceiver resampler."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(17)
    vis, hidden, out, num_query, n_w, n_h = 48, 256, 40, 8, 3, 2
    d_head = 128
    n_head = hidden // d_head
    cfg = ClipVisionConfig(
        image_size=28, patch_size=14, n_embd=vis, n_ff=64, n_layers=2,
        n_heads=4, eps=1e-5, proj_dim=out, use_gelu=True,
        projector_type="resampler", minicpmv_version=2)
    p = _rand_resampler_params(rng, vis, hidden, out, num_query)
    x = rng.standard_normal((n_w * n_h, vis)).astype(np.float32)

    got = np.asarray(_resampler(p, cfg, x, n_w, n_h))

    t = lambda k: torch.from_numpy(np.asarray(p[k]))  # noqa: E731
    q = F.layer_norm(t("resampler.query"), (hidden,),
                     t("resampler.ln_q.weight"), t("resampler.ln_q.bias"),
                     1e-5)
    v = torch.from_numpy(x) @ t("resampler.kv.weight").T
    v = F.layer_norm(v, (hidden,), t("resampler.ln_kv.weight"),
                     t("resampler.ln_kv.bias"), 1e-5)
    k = v + torch.from_numpy(get_2d_sincos_pos_embed(hidden, n_w, n_h))
    Q = (q @ t("resampler.attn.q.weight").T + t("resampler.attn.q.bias")) \
        / np.sqrt(d_head)
    K = k @ t("resampler.attn.k.weight").T + t("resampler.attn.k.bias")
    V = v @ t("resampler.attn.v.weight").T + t("resampler.attn.v.bias")
    Q = Q.reshape(num_query, n_head, d_head).permute(1, 0, 2)
    K = K.reshape(-1, n_head, d_head).permute(1, 0, 2)
    V = V.reshape(-1, n_head, d_head).permute(1, 0, 2)
    att = torch.softmax(Q @ K.transpose(1, 2), dim=-1)
    o = (att @ V).permute(1, 0, 2).reshape(num_query, hidden)
    o = o @ t("resampler.attn.out.weight").T + t("resampler.attn.out.bias")
    o = F.layer_norm(o, (hidden,), t("resampler.ln_post.weight"),
                     t("resampler.ln_post.bias"), 1e-5)
    want = (o @ t("resampler.proj.weight").T).numpy()

    assert got.shape == (num_query, out)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_minicpmv_mmproj_e2e(tmp_path):
    """Handwritten minicpmv mmproj GGUF: variable-size tiles all resample
    to num_query rows; ClipModel.encode_minicpmv returns the tile list +
    grid for the <image>/<slice> assembly."""
    import jax.numpy as jnp  # noqa: F401

    from prima_tpu.gguf.writer import GGUFWriter
    from prima_tpu.models.clip import ClipModel

    rng = np.random.default_rng(23)
    vis, hidden, out, num_query, ps = 32, 256, 24, 8, 14

    def r(*s, scale=0.1):
        return rng.standard_normal(s).astype(np.float32) * scale

    path = str(tmp_path / "mmproj-minicpmv.gguf")
    w = GGUFWriter(path, arch="clip")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.has_minicpmv_projector", True)
    w.add_kv("clip.minicpmv_version", 2)
    w.add_kv("clip.use_gelu", True)
    w.add_kv("clip.projector_type", "resampler")
    w.add_kv("clip.vision.image_size", 448)
    w.add_kv("clip.vision.patch_size", ps)
    w.add_kv("clip.vision.embedding_length", vis)
    w.add_kv("clip.vision.feed_forward_length", 48)
    w.add_kv("clip.vision.block_count", 2)
    w.add_kv("clip.vision.attention.head_count", 4)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_kv("clip.vision.projection_dim", out)
    w.add_kv("clip.vision.image_mean", np.asarray([0.5] * 3, np.float32))
    w.add_kv("clip.vision.image_std", np.asarray([0.5] * 3, np.float32))
    w.add_tensor("v.patch_embd.weight", r(vis, 3, ps, ps))
    w.add_tensor("v.patch_embd.bias", r(vis))
    w.add_tensor("v.position_embd.weight", r(70 * 70, vis))
    w.add_tensor("v.post_ln.weight", 1 + r(vis, scale=0.05))
    w.add_tensor("v.post_ln.bias", r(vis, scale=0.05))
    for i in range(2):
        pre = f"v.blk.{i}."
        w.add_tensor(pre + "ln1.weight", 1 + r(vis, scale=0.05))
        w.add_tensor(pre + "ln1.bias", r(vis, scale=0.05))
        for n in ("q", "k", "v"):
            w.add_tensor(pre + f"attn_{n}.weight", r(vis, vis))
            w.add_tensor(pre + f"attn_{n}.bias", r(vis))
        w.add_tensor(pre + "attn_out.weight", r(vis, vis))
        w.add_tensor(pre + "attn_out.bias", r(vis))
        w.add_tensor(pre + "ln2.weight", 1 + r(vis, scale=0.05))
        w.add_tensor(pre + "ln2.bias", r(vis, scale=0.05))
        w.add_tensor(pre + "ffn_down.weight", r(48, vis))
        w.add_tensor(pre + "ffn_down.bias", r(48))
        w.add_tensor(pre + "ffn_up.weight", r(vis, 48))
        w.add_tensor(pre + "ffn_up.bias", r(vis))
    for k, arr in _rand_resampler_params(rng, vis, hidden, out,

                                         num_query).items():
        w.add_tensor(k, arr)
    w.write()

    cm = ClipModel.load(path)
    assert cm.cfg.minicpmv_version == 2
    img = rng.integers(0, 255, (300, 500, 3), dtype=np.uint8)
    tiles, grid = cm.encode_minicpmv(img)
    assert grid == (1, 1) and len(tiles) == 1  # small image: single tile
    assert tiles[0].shape == (num_query, out)
    assert np.isfinite(tiles[0]).all()

    big = rng.integers(0, 255, (700, 1400, 3), dtype=np.uint8)
    tiles, (gw, gh) = cm.encode_minicpmv(big)
    assert len(tiles) == 1 + gw * gh and gw * gh >= 2
    for t in tiles:
        assert t.shape == (num_query, out) and np.isfinite(t).all()
    # encode() flattens the tiles for the generic path
    flat = cm.encode(big)
    assert flat.shape == (len(tiles) * num_query, out)
