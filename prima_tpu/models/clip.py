"""CLIP ViT vision encoder + LLaVA projector — mmproj GGUF consumer.

The analogue of the reference's examples/llava/clip.cpp: loads a
`mmproj-*.gguf` (KV namespace `clip.vision.*`, tensors `v.*` / `mm.*`,
clip.cpp:85-145), encodes preprocessed images into patch embeddings, and
projects them into the language model's embedding space.

Faithful behavioral details (clip.cpp build graph @582-815):
- patch conv2d (+ optional bias), class token at position 0, learned
  position embeddings, optional pre/post LayerNorm
- with a llava projector the transformer runs block_count - 1 layers
  (the penultimate "vision_feature_layer", @682)
- attention is bidirectional multi-head with q/k/v/out biases
- FFN activation: gelu when `clip.use_gelu` else quick-gelu (@747-751)
- NOTE the GGUF names are swapped vs HF: `ffn_down` = HF mlp.fc1
  (hidden->intermediate) and `ffn_up` = fc2 (convert_image_encoder_to_
  gguf.py:48, clip.cpp:1482-1483); this module follows the GGUF wire
  convention
- projector `mlp`: mm.0 linear -> gelu -> mm.2 linear, class token
  dropped (@785-792); `mlp_norm`: mm.0 -> LN mm.1 -> gelu -> mm.3 ->
  LN mm.4 (@793-813)

Also supported: the MobileVLM `ldp`/`ldpv2` conv projectors
(clip.cpp:1409-1480) and the minicpmv perceiver resampler (@734-783);
unknown projector types are clearly rejected at load.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# LLaVA's pad-to-square background color (mean RGB * 255, clip.cpp:1998)
PAD_COLOR = (122, 116, 104)


@dataclass
class ClipVisionConfig:
    image_size: int
    patch_size: int
    n_embd: int
    n_ff: int
    n_layers: int
    n_heads: int
    eps: float
    proj_dim: int
    use_gelu: bool
    projector_type: str
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    mm_patch_merge_type: str = "flat"
    grid_pinpoints: tuple = ()  # llava-1.6 anyres resolutions (w,h pairs)
    minicpmv_version: int = 0  # 0 = not minicpmv; 2/3 = resampler variants

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def from_gguf(cls, m) -> "ClipVisionConfig":
        if not m.get("clip.has_vision_encoder"):
            raise ValueError("mmproj GGUF has no vision encoder")
        proj = str(m.get("clip.projector_type") or "mlp")
        minicpmv = int(m.get("clip.minicpmv_version") or 0) \
            if m.get("clip.has_minicpmv_projector") else 0
        if minicpmv and proj == "mlp":  # minicpmv GGUFs may omit the key
            proj = "resampler"
        if proj not in ("mlp", "mlp_norm", "ldp", "ldpv2", "resampler"):
            raise NotImplementedError(
                f"clip projector type {proj!r} not supported "
                "(mlp/mlp_norm/ldp/ldpv2/resampler)")
        if proj == "resampler" and not minicpmv:
            minicpmv = 2
        return cls(
            image_size=int(m.get("clip.vision.image_size")),
            patch_size=int(m.get("clip.vision.patch_size")),
            n_embd=int(m.get("clip.vision.embedding_length")),
            n_ff=int(m.get("clip.vision.feed_forward_length")),
            n_layers=int(m.get("clip.vision.block_count")),
            n_heads=int(m.get("clip.vision.attention.head_count")),
            eps=float(m.get("clip.vision.attention.layer_norm_epsilon")
                      or 1e-5),
            proj_dim=int(m.get("clip.vision.projection_dim") or 0),
            use_gelu=bool(m.get("clip.use_gelu")),
            projector_type=proj,
            image_mean=tuple(np.asarray(
                m.get("clip.vision.image_mean")
                if m.get("clip.vision.image_mean") is not None
                else (0.48145466, 0.4578275, 0.40821073), np.float64)),
            image_std=tuple(np.asarray(
                m.get("clip.vision.image_std")
                if m.get("clip.vision.image_std") is not None
                else (0.26862954, 0.26130258, 0.27577711), np.float64)),
            mm_patch_merge_type=str(m.get("clip.vision.mm_patch_merge_type")
                                    or "flat"),
            grid_pinpoints=tuple(
                int(x) for x in np.ravel(np.asarray(
                    m.get("clip.vision.image_grid_pinpoints")
                    if m.get("clip.vision.image_grid_pinpoints") is not None
                    else [], np.int64))),
            minicpmv_version=minicpmv,
        )


def load_clip_params(m, cfg: ClipVisionConfig, dtype=jnp.float32) -> dict:
    """Load mmproj tensors (clip.cpp:1440-1508 names) as jax arrays."""
    from ..quant.dequant_np import dequantize_tensor

    def t(name, required=True):
        ti = m.tensors.get(name)
        if ti is None:
            if required:
                raise KeyError(f"mmproj missing tensor {name}")
            return None
        return jnp.asarray(dequantize_tensor(ti), dtype)

    p: dict[str, Any] = {
        "patch_embd": t("v.patch_embd.weight"),      # (hid, 3, ps, ps)
        "patch_bias": t("v.patch_embd.bias", False),
        "class_embd": t("v.class_embd", False),
        "pos_embd": t("v.position_embd.weight"),
        "pre_ln_w": t("v.pre_ln.weight", False),
        "pre_ln_b": t("v.pre_ln.bias", False),
        "post_ln_w": t("v.post_ln.weight", False),
        "post_ln_b": t("v.post_ln.bias", False),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        pre = f"v.blk.{i}."
        p["layers"].append({
            k: t(pre + n) for k, n in [
                ("ln1_w", "ln1.weight"), ("ln1_b", "ln1.bias"),
                ("q_w", "attn_q.weight"), ("q_b", "attn_q.bias"),
                ("k_w", "attn_k.weight"), ("k_b", "attn_k.bias"),
                ("v_w", "attn_v.weight"), ("v_b", "attn_v.bias"),
                ("o_w", "attn_out.weight"), ("o_b", "attn_out.bias"),
                ("ln2_w", "ln2.weight"), ("ln2_b", "ln2.bias"),
                ("ffi_w", "ffn_down.weight"), ("ffi_b", "ffn_down.bias"),
                ("ffo_w", "ffn_up.weight"), ("ffo_b", "ffn_up.bias"),
            ]})
    # projector
    if cfg.projector_type == "mlp":
        keys = ["mm.0.weight", "mm.0.bias", "mm.2.weight", "mm.2.bias"]
    elif cfg.projector_type == "mlp_norm":
        keys = ["mm.0.weight", "mm.0.bias", "mm.1.weight", "mm.1.bias",
                "mm.3.weight", "mm.3.bias", "mm.4.weight", "mm.4.bias"]
    elif cfg.projector_type == "ldp":  # MobileVLM (clip.cpp:1409-1434)
        keys = ["mm.model.mlp.1.weight", "mm.model.mlp.1.bias",
                "mm.model.mlp.3.weight", "mm.model.mlp.3.bias"]
        for b in (1, 2):
            pre = f"mm.model.mb_block.{b}.block"
            keys += [f"{pre}.0.0.weight", f"{pre}.0.1.weight",
                     f"{pre}.0.1.bias", f"{pre}.1.fc1.weight",
                     f"{pre}.1.fc1.bias", f"{pre}.1.fc2.weight",
                     f"{pre}.1.fc2.bias", f"{pre}.2.0.weight",
                     f"{pre}.2.1.weight", f"{pre}.2.1.bias"]
    elif cfg.projector_type == "ldpv2":  # MobileVLM v2
        keys = ["mm.model.mlp.0.weight", "mm.model.mlp.0.bias",
                "mm.model.mlp.2.weight", "mm.model.mlp.2.bias",
                "mm.model.peg.0.weight", "mm.model.peg.0.bias"]
    else:  # minicpmv resampler (clip.cpp:1446-1464)
        keys = ["resampler.query", "resampler.proj.weight",
                "resampler.kv.weight"]
        keys += [f"resampler.attn.{n}.{s}" for n in ("q", "k", "v", "out")
                 for s in ("weight", "bias")]
        keys += [f"resampler.ln_{n}.{s}" for n in ("q", "kv", "post")
                 for s in ("weight", "bias")]
    for k in keys:
        p[k] = t(k)
    return p


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hardsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _dw_conv3x3(x, w, stride: int):
    """Depthwise 3x3 conv, padding 1 (ggml_conv_depthwise_2d).
    x (C, H, W), w (C, 1, 3, 3) -> (C, H/stride, W/stride)."""
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(stride, stride),
        padding=((1, 1), (1, 1)), feature_group_count=x.shape[0],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[0]


def _ldp_block(x, p, prefix: str, eps: float, stride: int,
               residual: bool) -> jax.Array:
    """One MobileVLM LDP inverted-residual block (clip.cpp:815-923):
    depthwise conv -> channel LN -> hardswish -> squeeze-excite ->
    pointwise linear -> channel LN (-> +residual). x (C, H, W)."""
    h = _dw_conv3x3(x, p[f"{prefix}.0.0.weight"], stride)
    t = h.transpose(1, 2, 0)  # (H, W, C): LN over channels
    t = _ln(t, p[f"{prefix}.0.1.weight"], p[f"{prefix}.0.1.bias"], eps)
    hw = _hardswish(t.transpose(2, 0, 1))
    se = hw.mean(axis=(1, 2))  # global avg pool (C,)
    se = jnp.maximum(se @ p[f"{prefix}.1.fc1.weight"].T
                     + p[f"{prefix}.1.fc1.bias"], 0.0)
    se = _hardsigmoid(se @ p[f"{prefix}.1.fc2.weight"].T
                      + p[f"{prefix}.1.fc2.bias"])
    h = hw * se[:, None, None]
    c, hh, ww = h.shape
    t = h.transpose(1, 2, 0).reshape(hh * ww, c)  # (HW, C)
    t = t @ p[f"{prefix}.2.0.weight"].T  # pointwise, no bias
    t = _ln(t, p[f"{prefix}.2.1.weight"], p[f"{prefix}.2.1.bias"], eps)
    out = t.reshape(hh, ww, c).transpose(2, 0, 1)
    return out + x if residual else out


def apply_projector(params: dict, cfg: ClipVisionConfig,
                    x: jax.Array) -> jax.Array:
    """Project ViT patch features (n_patches, vis_hidden) into the LM's
    embedding space. mlp/mlp_norm return n_patches rows; ldp/ldpv2
    downsample 2x2 (clip.cpp:770-955)."""
    if cfg.projector_type in ("mlp", "mlp_norm"):
        x = x @ params["mm.0.weight"].T + params["mm.0.bias"]
        if cfg.projector_type == "mlp":
            x = _gelu(x, True)
            return x @ params["mm.2.weight"].T + params["mm.2.bias"]
        x = _ln(x, params["mm.1.weight"], params["mm.1.bias"], cfg.eps)
        x = _gelu(x, True)
        x = x @ params["mm.3.weight"].T + params["mm.3.bias"]
        return _ln(x, params["mm.4.weight"], params["mm.4.bias"], cfg.eps)

    n_side = cfg.image_size // cfg.patch_size
    if cfg.projector_type == "ldp":
        h = x @ params["mm.model.mlp.1.weight"].T \
            + params["mm.model.mlp.1.bias"]
        h = _gelu(h, True)
        h = h @ params["mm.model.mlp.3.weight"].T \
            + params["mm.model.mlp.3.bias"]
        c = h.shape[-1]
        grid = h.reshape(n_side, n_side, c).transpose(2, 0, 1)  # (C, H, W)
        grid = _ldp_block(grid, params, "mm.model.mb_block.1.block",
                          cfg.eps, stride=1, residual=True)
        grid = _ldp_block(grid, params, "mm.model.mb_block.2.block",
                          cfg.eps, stride=2, residual=False)
        return grid.transpose(1, 2, 0).reshape(-1, c)

    # ldpv2: mlp -> 2x2 avg pool -> depthwise positional-encoding residual
    h = x @ params["mm.model.mlp.0.weight"].T + params["mm.model.mlp.0.bias"]
    h = _gelu(h, True)
    h = h @ params["mm.model.mlp.2.weight"].T + params["mm.model.mlp.2.bias"]
    c = h.shape[-1]
    grid = h.reshape(n_side, n_side, c).transpose(2, 0, 1)
    grid = grid.reshape(c, n_side // 2, 2, n_side // 2, 2).mean(axis=(2, 4))
    peg = _dw_conv3x3(grid, params["mm.model.peg.0.weight"], 1)
    out = (peg.transpose(1, 2, 0) + params["mm.model.peg.0.bias"]
           + grid.transpose(1, 2, 0))
    return out.reshape(-1, c)


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


def _gelu(x, use_gelu: bool):
    xf = x.astype(jnp.float32)
    if use_gelu:
        g = 0.5 * xf * (1.0 + jnp.tanh(
            np.float32(0.7978845608028654) * (xf + 0.044715 * xf ** 3)))
    else:  # quick gelu (ggml_gelu_quick): x * sigmoid(1.702 x)
        g = xf * jax.nn.sigmoid(np.float32(1.702) * xf)
    return g.astype(x.dtype)


def bucket_position_ids(n_h: int, n_w: int) -> np.ndarray:
    """siglip-navit interpolation buckets for variable-size images
    (clip.cpp:2360-2380): patch (y, x) -> floor(70 y / n_h) * 70 +
    floor(70 x / n_w), row-major."""
    by = np.floor(70.0 * np.arange(n_h) / n_h).astype(np.int32)
    bx = np.floor(70.0 * np.arange(n_w) / n_w).astype(np.int32)
    return (by[:, None] * 70 + bx[None, :]).reshape(-1)


def get_2d_sincos_pos_embed(embed_dim: int, pos_w: int,
                            pos_h: int) -> np.ndarray:
    """Qwen-VL-style 2D sincos table for the resampler's K
    (get_2d_sincos_pos_embed, clip.cpp:2198-2282): row[y * pos_w + x]
    carries [sin/cos(x · ω) | sin/cos(y · ω)]."""
    half = embed_dim // 2
    quarter = half // 2
    omega = 1.0 / 10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter)

    def emb_1d(pos):  # (...,) -> (..., half)
        out = pos[..., None] * omega
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    a = np.broadcast_to(np.arange(pos_w, dtype=np.float64)[:, None],
                        (pos_w, pos_h))  # grid "h" index over the first size
    b = np.broadcast_to(np.arange(pos_h, dtype=np.float64)[None, :],
                        (pos_w, pos_h))
    emb = np.concatenate([emb_1d(a), emb_1d(b)], axis=-1)  # (pos_w,pos_h,d)
    # pos_embed_2d[w * H + h] = emb[h][w]  (clip.cpp:2274-2278)
    return emb.transpose(1, 0, 2).reshape(pos_w * pos_h,
                                          embed_dim).astype(np.float32)


def _resampler(params: dict, cfg: ClipVisionConfig, x: jax.Array,
               n_w: int, n_h: int) -> jax.Array:
    """minicpmv perceiver resampler (clip.cpp:955-1016): learned queries
    cross-attend to kv-projected patch features with additive 2D sincos
    positions on K. x (n_pos, vis_hidden) -> (num_query, hidden)."""
    q = params["resampler.query"]  # (num_query, hidden)
    hidden = q.shape[-1]
    d_head = 128
    n_head = hidden // d_head
    q = _ln(q, params["resampler.ln_q.weight"],
            params["resampler.ln_q.bias"], cfg.eps)
    v = x @ params["resampler.kv.weight"].T  # no bias (TN_MINICPMV_KV_PROJ)
    v = _ln(v, params["resampler.ln_kv.weight"],
            params["resampler.ln_kv.bias"], cfg.eps)
    k = v + jnp.asarray(get_2d_sincos_pos_embed(hidden, n_w, n_h))

    def heads(t):
        return t.reshape(t.shape[0], n_head, d_head).transpose(1, 0, 2)

    Q = heads((q @ params["resampler.attn.q.weight"].T
               + params["resampler.attn.q.bias"]) / np.sqrt(d_head))
    K = heads(k @ params["resampler.attn.k.weight"].T
              + params["resampler.attn.k.bias"])
    V = heads(v @ params["resampler.attn.v.weight"].T
              + params["resampler.attn.v.bias"])
    att = jax.nn.softmax(jnp.einsum("hqd,hkd->hqk", Q, K,
                                    preferred_element_type=jnp.float32),
                         axis=-1)
    o = jnp.einsum("hqk,hkd->hqd", att.astype(V.dtype), V)
    o = o.transpose(1, 0, 2).reshape(-1, hidden)
    o = o @ params["resampler.attn.out.weight"].T \
        + params["resampler.attn.out.bias"]
    o = _ln(o, params["resampler.ln_post.weight"],
            params["resampler.ln_post.bias"], cfg.eps)
    return o @ params["resampler.proj.weight"].T


def clip_encode_image(params: dict, cfg: ClipVisionConfig,
                      pixels: jax.Array) -> jax.Array:
    """pixels (3, H, W) f32 normalized -> projected patch embeddings
    (n_patches, llm_embd). The full clip.cpp graph for one image.
    minicpmv accepts variable H/W (multiples of patch_size)."""
    ps, hid = cfg.patch_size, cfg.n_embd
    _, H, W = pixels.shape
    n_h, n_w = H // ps, W // ps
    # patch conv2d == unfold + matmul on the MXU
    patches = pixels.reshape(3, n_h, ps, n_w, ps)
    patches = patches.transpose(1, 3, 0, 2, 4).reshape(n_h * n_w,
                                                       3 * ps * ps)
    kernel = params["patch_embd"].reshape(hid, 3 * ps * ps)
    x = patches @ kernel.T  # (n_patches, hid)
    if params.get("patch_bias") is not None:
        x = x + params["patch_bias"]
    if cfg.minicpmv_version:
        # siglip: no class token; interpolation-bucket position ids
        x = x + params["pos_embd"][jnp.asarray(bucket_position_ids(n_h, n_w))]
    else:
        if params.get("class_embd") is not None:
            x = jnp.concatenate([params["class_embd"][None], x], axis=0)
        x = x + params["pos_embd"][: x.shape[0]]
    if params.get("pre_ln_w") is not None:
        x = _ln(x, params["pre_ln_w"], params["pre_ln_b"], cfg.eps)

    n_heads = cfg.n_heads
    hd = hid // n_heads
    scale = 1.0 / np.sqrt(hd)
    # llava feature layer: penultimate (clip.cpp:682 `il < n_layer - 1`);
    # minicpmv runs every stored layer (n_layer += 1 before the loop, @679)
    n_run = cfg.n_layers if cfg.minicpmv_version else cfg.n_layers - 1
    for layer in params["layers"][:n_run]:
        h = _ln(x, layer["ln1_w"], layer["ln1_b"], cfg.eps)
        q = (h @ layer["q_w"].T + layer["q_b"]) * scale
        k = h @ layer["k_w"].T + layer["k_b"]
        v = h @ layer["v_w"].T + layer["v_b"]
        n = h.shape[0]
        q = q.reshape(n, n_heads, hd).transpose(1, 0, 2)
        k = k.reshape(n, n_heads, hd).transpose(1, 0, 2)
        v = v.reshape(n, n_heads, hd).transpose(1, 0, 2)
        att = jax.nn.softmax(
            jnp.einsum("hqd,hkd->hqk", q, k,
                       preferred_element_type=jnp.float32), axis=-1)
        o = jnp.einsum("hqk,hkd->hqd", att.astype(v.dtype), v)
        o = o.transpose(1, 0, 2).reshape(n, hid)
        x = x + (o @ layer["o_w"].T + layer["o_b"])
        h = _ln(x, layer["ln2_w"], layer["ln2_b"], cfg.eps)
        h = _gelu(h @ layer["ffi_w"].T + layer["ffi_b"], cfg.use_gelu)
        x = x + (h @ layer["ffo_w"].T + layer["ffo_b"])

    if params.get("post_ln_w") is not None:
        x = _ln(x, params["post_ln_w"], params["post_ln_b"], cfg.eps)

    if cfg.minicpmv_version:
        return _resampler(params, cfg, x, n_w, n_h)

    # drop the class token (ggml_get_rows with patches = 1..n, @774-781)
    if params.get("class_embd") is not None:
        x = x[1:]

    return apply_projector(params, cfg, x)


def preprocess_image(img: np.ndarray, cfg: ClipVisionConfig) -> np.ndarray:
    """LLaVA-1.5 preprocessing (clip.cpp:1971-2010 + 2040-2075): pad the
    shorter side to square with the mean background color, bicubic-resize
    to image_size, scale to [0,1] and normalize with CLIP mean/std.
    img: (H, W, 3) uint8 RGB. -> (3, S, S) float32."""
    from PIL import Image

    h, w = img.shape[:2]
    if h != w:
        side = max(h, w)
        canvas = np.empty((side, side, 3), np.uint8)
        canvas[:, :] = PAD_COLOR
        canvas[:h, :w] = img
        img = canvas
    pil = Image.fromarray(img).resize(
        (cfg.image_size, cfg.image_size), Image.BICUBIC)
    x = np.asarray(pil, np.float32) / 255.0
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    x = (x - mean) / std
    return x.transpose(2, 0, 1)  # (3, S, S)


def select_best_resolution(size: tuple[int, int],
                           resolutions) -> tuple[int, int]:
    """(w, h) of the pinpoint that maximizes effective resolution, then
    minimizes waste (clip.cpp:1746-1770)."""
    ow, oh = size
    best, best_eff, best_waste = None, 0, 1 << 62
    for rw, rh in resolutions:
        scale = min(rw / ow, rh / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = rw * rh - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (rw, rh), eff, waste
    return best


def resize_and_pad(img: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Aspect-preserving bicubic resize centered on a black canvas
    (resize_and_pad_image, clip.cpp:1697-1737)."""
    from PIL import Image

    tw, th = target
    h, w = img.shape[:2]
    scale_w, scale_h = tw / w, th / h
    if scale_w < scale_h:
        nw, nh = tw, min(int(np.ceil(h * scale_w)), th)
    else:
        nh, nw = th, min(int(np.ceil(w * scale_h)), tw)
    resized = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BICUBIC))
    canvas = np.zeros((th, tw, 3), np.uint8)
    py, px = (th - nh) // 2, (tw - nw) // 2
    canvas[py:py + nh, px:px + nw] = resized
    return canvas


def anyres_tiles(img: np.ndarray, cfg: ClipVisionConfig
                 ) -> tuple[list[np.ndarray], tuple[int, int]]:
    """llava-1.6 anyres preprocessing (clip.cpp:2015-2040): [base square
    resize of the original] + image_size tiles of the best-fit padded
    image. Returns (uint8 tiles, (grid_w, grid_h))."""
    from PIL import Image

    pins = cfg.grid_pinpoints
    res = [(pins[i], pins[i + 1]) for i in range(0, len(pins) - 1, 2)]
    h, w = img.shape[:2]
    best = select_best_resolution((w, h), res)
    padded = resize_and_pad(img, best)
    s = cfg.image_size
    tiles = [np.asarray(Image.fromarray(img).resize((s, s), Image.BICUBIC))]
    for y in range(0, best[1], s):
        for x in range(0, best[0], s):
            tiles.append(padded[y:y + s, x:x + s])
    return tiles, (best[0] // s, best[1] // s)


def _ensure_divide(length: int, patch_size: int) -> int:
    # C++ std::round (half away from zero), NOT Python banker's rounding
    return max(int(np.floor(length / patch_size + 0.5)) * patch_size,
               patch_size)


def _uhd_find_best_resize(size, scale_resolution: int, patch_size: int,
                          allow_upscale: bool = False) -> tuple[int, int]:
    w, h = size
    if w * h > scale_resolution * scale_resolution or allow_upscale:
        r = w / h
        h = int(scale_resolution / np.sqrt(r))
        w = int(h * r)
    return _ensure_divide(w, patch_size), _ensure_divide(h, patch_size)


def uhd_best_grid(max_slice_nums: int, multiple: int,
                  log_ratio: float) -> tuple[int, int]:
    candidates = []
    for i in (multiple - 1, multiple, multiple + 1):
        if i == 1 or i > max_slice_nums:
            continue
        for m in range(1, i + 1):
            if i % m == 0:
                candidates.append((m, i // m))
    best, err = (1, 1), float("inf")
    for gx, gy in candidates:
        e = abs(log_ratio - np.log(gx / gy))
        if e < err:
            best, err = (gx, gy), e
    return best


def uhd_slice_image(img: np.ndarray, patch_size: int = 14,
                    scale_resolution: int = 448, max_slice_nums: int = 9
                    ) -> tuple[list[np.ndarray], tuple[int, int]]:
    """LLaVA-UHD slicing for minicpmv (uhd_slice_image, clip.cpp:1866-1932):
    -> ([source image] + row-major grid slices as uint8 arrays,
        (grid_cols, grid_rows)); grid is (1, 1) with no slices when the
    image is small enough."""
    from PIL import Image

    h, w = img.shape[:2]
    log_ratio = float(np.log(w / h))
    ratio = w * h / (scale_resolution * scale_resolution)
    multiple = int(min(np.ceil(ratio), max_slice_nums))

    def resize(im, size):
        return np.asarray(Image.fromarray(im).resize(size, Image.BICUBIC))

    if multiple <= 1:
        best = _uhd_find_best_resize((w, h), scale_resolution, patch_size,
                                     allow_upscale=True)
        return [resize(img, best)], (1, 1)

    best = _uhd_find_best_resize((w, h), scale_resolution, patch_size)
    tiles = [resize(img, best)]
    grid = uhd_best_grid(max_slice_nums, multiple, log_ratio)
    # refine size: each grid cell resized to its own best fit
    gw, gh = grid
    rw, rh = _ensure_divide(w, gw), _ensure_divide(h, gh)
    bw, bh = _uhd_find_best_resize((rw // gw, rh // gh), scale_resolution,
                                   patch_size, allow_upscale=True)
    refine = resize(img, (bw * gw, bh * gh))
    for gy in range(gh):
        for gx in range(gw):
            tiles.append(refine[gy * bh:(gy + 1) * bh,
                                gx * bw:(gx + 1) * bw])
    return tiles, grid


def merge_anyres_embeds(tile_embeds: list[np.ndarray],
                        grid: tuple[int, int], n_side: int) -> np.ndarray:
    """Assemble [base | spatially-merged grid] the way
    clip_llava_handle_patches does (llava.cpp:99-224, the no-unpad/
    no-newline variant): grid tiles (gh, gw, s, s, D) -> permute
    (gh, s, gw, s, D) -> flatten."""
    gw, gh = grid
    base, rest = tile_embeds[0], np.stack(tile_embeds[1:])
    d = base.shape[-1]
    merged = rest.reshape(gh, gw, n_side, n_side, d) \
        .transpose(0, 2, 1, 3, 4).reshape(-1, d)
    return np.concatenate([base, merged], axis=0)


@dataclass
class ClipModel:
    cfg: ClipVisionConfig
    params: dict = field(repr=False)

    @classmethod
    def load(cls, path: str, dtype=jnp.float32) -> "ClipModel":
        from ..gguf.reader import GGUFModel

        m = GGUFModel.open(path)
        cfg = ClipVisionConfig.from_gguf(m)
        params = load_clip_params(m, cfg, dtype)
        m.close()
        return cls(cfg, params)

    def _normalize(self, tile: np.ndarray) -> np.ndarray:
        x = tile.astype(np.float32) / 255.0
        mean = np.asarray(self.cfg.image_mean, np.float32)
        std = np.asarray(self.cfg.image_std, np.float32)
        return ((x - mean) / std).transpose(2, 0, 1)

    def encode(self, img: np.ndarray) -> np.ndarray:
        """uint8 (H, W, 3) image -> (n_img_pos, llm_embd) f32.

        llava-1.5: one pad-to-square tile (n_patches rows). llava-1.6
        (spatial_unpad + grid pinpoints): base tile + spatially merged
        grid tiles (llava.cpp clip_llava_handle_patches)."""
        cfg = self.cfg
        if cfg.mm_patch_merge_type == "spatial_unpad" and cfg.grid_pinpoints:
            tiles, grid = anyres_tiles(img, cfg)
            embeds = [np.asarray(
                clip_encode_image(self.params, cfg,
                                  jnp.asarray(self._normalize(t))),
                np.float32) for t in tiles]
            return merge_anyres_embeds(embeds, grid,
                                       cfg.image_size // cfg.patch_size)
        if cfg.minicpmv_version:
            tiles, _grid = self.encode_minicpmv(img)
            return np.concatenate(tiles, axis=0)
        px = jnp.asarray(preprocess_image(img, cfg))
        return np.asarray(clip_encode_image(self.params, cfg, px),
                          np.float32)

    def encode_minicpmv(self, img: np.ndarray
                        ) -> tuple[list[np.ndarray], tuple[int, int]]:
        """minicpmv: uhd-slice the image, resample each tile to num_query
        rows -> (per-tile embeddings [source, slices...], (cols, rows))
        for the <image>/<slice> prompt assembly (minicpmv-cli.cpp
        process_image)."""
        cfg = self.cfg
        tiles, grid = uhd_slice_image(img, cfg.patch_size)
        out = [np.asarray(
            clip_encode_image(self.params, cfg,
                              jnp.asarray(self._normalize(t))), np.float32)
            for t in tiles]
        return out, grid
