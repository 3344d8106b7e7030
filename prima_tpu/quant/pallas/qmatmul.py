"""Fused dequant + matmul Pallas kernels for the uniform quant layout.

The TPU replacement for the reference's fused quantized GEMV/GEMM kernels
(ggml_vec_dot_q4_K_q8_K ggml-quants.c:7713, CUDA mmvq/mmq). Weights stay
packed in HBM (nib4: 4 bits/w + f32 sub-block scales; int8: 8 bits/w) and
are widened tile-by-tile in VMEM; the decode GEMV is HBM-bandwidth-bound,
so bytes-from-HBM per weight is the whole ballgame for tokens/s.

Design notes (v3):
  * Every qs byte is fetched from HBM exactly once: a nib4 byte tile yields
    BOTH its low-nibble and high-nibble column groups in the same grid step
    (two MXU dots against two x slices), instead of re-reading the tile.
  * The affine terms never touch the big tile: for sub-block c,
    y += Σ_c x_c·(sc·off − min) = xs @ (off·sc − mins)ᵀ with xs the per-sub-
    block sums of x (B, S) — one tiny dot at kt == 0 replaces a full-width
    second dot and the per-weight offset add.
  * Layout trick: weight columns are host-permuted to p = t*S + sigma(s)
    (s = sub-block index, S = K/sub; sigma(s) = (s % gsub)*G + s//gsub puts
    the K-quant superblock index minor). In permuted space the scale CODE
    for column p is codes[p mod S] and its superblock base is d[p mod G],
    so both in-kernel expansions are lane-aligned tile repeats. The
    activation picks up the same permutation with one cheap XLA reshape-
    transpose per call; the result is permutation-invariant.
  * Compact grouped scales (K-quants): int8 codes + per-superblock f32
    d/dmin stream from HBM (Q4_K: 4.75 bits/weight vs 6 with premultiplied
    f32 scales); the effective scale d*code is ONE f32 multiply in-kernel —
    bit-identical to the host premultiply, ~25% less HBM traffic.
  * Whole-row k-tiles when kb <= 8192: the activation block's index map is
    then constant across the grid, so Pallas streams x once instead of once
    per n-tile.

Precision: `fast=False` dequantizes in f32 (reference-exact weights, matches
qmatmul_xla); `fast=True` uses bf16 weights on the MXU — still *more*
precise than the reference CPU path, which quantizes activations to Q8_K
(8 bits, ggml-quants.c:3835) before its integer dot.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dequant_jax import QTensor, qmatmul_xla


def _interpret() -> bool:
    return os.environ.get("PRIMA_PALLAS_INTERPRET", "0") == "1"


def _tile_repeat(sc: jax.Array, reps: int) -> jax.Array:
    """[c0..cS-1] -> [c0..cS-1, c0..cS-1, ...] along axis 1.

    When S (the scale-row length) is not a multiple of the 128-lane VPU
    width, a direct reps-fold repeat pays a cross-lane shuffle per output
    lane-tile (roofline_r5.json: 20-30% of the whole kernel on the
    14B/K=5120 and down/K=13824 shapes, whose S = 160/432/448 are
    misaligned — the round-4 14B deficit). Repeating in two steps bounds
    the misaligned shuffle work at lcm(S, 128) lanes; the second repeat
    reads a lane-aligned array and is plain tile copies."""
    if reps == 1:
        return sc
    if _interpret():
        return jnp.tile(sc, (1, reps))
    # per-shape choice (scale_expand_r5.json, on-chip): twostep wins on
    # every S=160 shape (+2-3%: 14B/32B wqkv/wo/gateup and both vocab
    # heads at K=5120), loses ~5% on S=432/448 (the down projections),
    # no-ops on lane-aligned S. "auto" encodes exactly that.
    strat = os.environ.get("PRIMA_QMM_REPEAT", "auto")
    s = sc.shape[-1]
    if strat == "auto":
        strat = "twostep" if s % 128 == 32 else "direct"
    if strat == "twostep" and s % 128:
        r1 = 128 // np.gcd(s, 128)
        if r1 > 1 and reps % r1 == 0:
            return pltpu.repeat(pltpu.repeat(sc, r1, axis=1),
                                reps // r1, axis=1)
    if strat == "bcast":
        n = sc.shape[0]
        return jax.lax.broadcast_in_dim(
            sc, (n, reps, s), (0, 2)).reshape(n, reps * s)
    return pltpu.repeat(sc, reps, axis=1)


def permute_cols_np(a: np.ndarray, sub: int, gsub: int = 1) -> np.ndarray:
    """(..., K) natural order -> kernel order p = t*S + sigma(s), where
    sigma(s) = (s % gsub)*G + s // gsub puts the scale GROUP index in the
    minor position so the in-kernel group-base (d) expansion is a lane tile
    (host, load time)."""
    k = a.shape[-1]
    s = k // sub
    g = s // gsub
    nd = a.ndim
    # natural axes (..., G, gsub, sub) = (g, w, t) -> stored (t, w, g)
    return np.ascontiguousarray(
        a.reshape(a.shape[:-1] + (g, gsub, sub))
        .transpose(tuple(range(nd - 1)) + (nd + 1, nd, nd - 1))
        .reshape(a.shape)
    )


def permute_subs_np(codes: np.ndarray, gsub: int) -> np.ndarray:
    """Per-sub-block rows (..., S) natural -> sigma order (host, load time)."""
    if gsub == 1:
        return codes
    s = codes.shape[-1]
    return np.ascontiguousarray(
        codes.reshape(codes.shape[:-1] + (s // gsub, gsub))
        .swapaxes(-1, -2)
        .reshape(codes.shape)
    )


def permute_x(x: jax.Array, sub: int, gsub: int = 1) -> jax.Array:
    """Apply the same column permutation to the activation (XLA, per call)."""
    k = x.shape[-1]
    s = k // sub
    g = s // gsub
    nd = x.ndim
    return (
        x.reshape(x.shape[:-1] + (g, gsub, sub))
        .transpose(tuple(range(nd - 1)) + (nd + 1, nd, nd - 1))
        .reshape(x.shape)
    )


def unpermute_w(w: jax.Array, sub: int, gsub: int = 1) -> jax.Array:
    """Inverse permutation for materialized weights (XLA fallback paths)."""
    k = w.shape[-1]
    s = k // sub
    g = s // gsub
    nd = w.ndim
    return (
        w.reshape(w.shape[:-1] + (sub, gsub, g))
        .transpose(tuple(range(nd - 1)) + (nd + 1, nd, nd - 1))
        .reshape(w.shape)
    )


def _dot_nt(x, w, exact: bool = False):
    """(B, K) @ (N, K)^T -> (B, N) f32. exact=True forces full-f32 MXU
    passes (bf16x3) — the TPU MXU's default single pass rounds operands to
    bf16 mantissas; the GEMV is memory-bound so the extra passes are free."""
    return jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else None,
    )


def _f16_bits_to_f32(bits: jax.Array) -> jax.Array:
    """Exact f16 bit pattern (int32 in [0, 65536)) -> f32 value, integer ops
    only (Mosaic has no f16 dtype): normals are re-biased and bit-assembled,
    subnormals computed as sign * mant * 2^-24 (exact: mant < 2^11)."""
    s = (bits >> 15) & 1
    e = (bits >> 10) & 31
    m = bits & 1023
    # e == 31 (inf/NaN) maps to f32 exponent 255 so bad data propagates
    e32 = jnp.where(e == 31, 255, e + 112)
    normal = jax.lax.bitcast_convert_type(
        ((s << 31) | (e32 << 23) | (m << 13)).astype(jnp.int32),
        jnp.float32)
    sub = ((1 - 2 * s) * m).astype(jnp.float32) * np.float32(2.0 ** -24)
    return jnp.where(e > 0, normal, sub)


def _group_expand(base: jax.Array, s: int) -> jax.Array:
    """(N_T, G) group bases -> (N_T, S) per-sub-block, sigma order (group
    index = s' mod G). out[n, j] = base[n, j % g] is a g-periodic tiling,
    i.e. a pure lane-copy repeat — exact by construction (no arithmetic).

    The round-4 code computed this as a 0/1 expansion matmul at
    Precision.HIGHEST (6-pass f32): with "batch" n_tile=512 that is MORE
    MXU work per grid step than the main nibble dot, twice per tile
    (scales + mins) — the 20-30%% kernel deficit on every shape whose
    padded dot dims misalign (roofline_r5.json / scale_expand_r5.json)."""
    g = base.shape[-1]
    if os.environ.get("PRIMA_QMM_EXPAND", "repeat") == "repeat":
        return _tile_repeat(base, s // g)
    e = (
        jax.lax.broadcasted_iota(jnp.int32, (g, s), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (g, s), 1) % g
    ).astype(jnp.float32)
    # HIGHEST: the MXU's default single pass would round the f32 bases to
    # bf16 mantissas — with full passes every output is ONE exact product
    return jax.lax.dot_general(
        base, e, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _qmm_kernel(
    x_lo_ref,  # (B, C_T) — permuted activation, low-nibble columns
    x_hi_ref,  # (B, C_T) — high-nibble columns (nib4 only; else absent)
    xs_ref,  # (B, S) per-sub-block x sums (affine formats only; else absent)
    qs_ref,  # (N_T, C_T) uint8 nib4 bytes | int8
    sc_ref,  # (N_T, S) f32 | int8 codes (grouped) — sigma order
    mn_ref,  # (N_T, S) f32 | int8 codes, or absent
    d_ref,  # (N_T, G) f32 group scale bases (grouped only; else absent)
    dm_ref,  # (N_T, G) f32 group min bases (grouped w/ mins; else absent)
    o_ref,  # (B, N_T) f32
    *,
    layout: str,
    q_offset: int,
    t_chunk: int,
    has_mins: bool,
    grouped: bool,
    packed: bool,
    fast: bool,
    exact: bool,
):
    kt = pl.program_id(1)
    cdtype = jnp.bfloat16 if fast else jnp.float32
    if packed:
        # native-footprint layout (host_pack): 6-bit sc/mn codes in 1.5
        # bytes per sub-block, f16 d/dmin bit-pair per superblock — unpacked
        # here with exact integer ops, then the same f32 d*code multiply.
        s = sc_ref.shape[-1]
        a1 = sc_ref[:].astype(jnp.int32)
        a2 = mn_ref[:].astype(jnp.int32)  # (N_T, S/2) low-nibble pairs
        sc_code = (a1 & 63).astype(jnp.float32)
        mn_code = (((a1 >> 6) << 4)
                   | jnp.concatenate([a2 & 15, a2 >> 4], axis=1)
                   ).astype(jnp.float32)
        du = d_ref[:].astype(jnp.int32)
        d_f = _f16_bits_to_f32(du & 0xFFFF)
        dm_f = _f16_bits_to_f32((du >> 16) & 0xFFFF)
        sc_full = _group_expand(d_f, s) * sc_code
        mn_full = _group_expand(dm_f, s) * mn_code
    elif grouped:
        # effective scale = d[group] * code, multiplied here in f32 — the
        # same single rounding as the reference host premultiply.
        s = sc_ref.shape[-1]
        sc_full = _group_expand(d_ref[:], s) * sc_ref[:].astype(jnp.float32)
        mn_full = (
            _group_expand(dm_ref[:], s) * mn_ref[:].astype(jnp.float32)
            if has_mins else None
        )
    else:
        sc_full = sc_ref[:]
        mn_full = mn_ref[:] if has_mins else None
    scales = _tile_repeat(sc_full, t_chunk).astype(cdtype)

    # Precision of the BIG dot: the MXU's default single pass rounds
    # operands to bf16 mantissas — as precise as the reference CPU path,
    # which quantizes activations to 8-bit Q8_K (ggml-quants.c:3835)
    # before its integer dot. exact=True (PRIMA_QMM_EXACT=1) requests
    # full-f32 multi-pass MXU matmuls for bit-parity runs; at decode
    # batch sizes the padded-batch pass cost exceeds the DMA time, so it
    # is opt-in, not the default.
    if layout == "nib4":
        b = qs_ref[:].astype(jnp.int32)  # Mosaic: no direct u8->float cast
        acc = _dot_nt(x_lo_ref[:].astype(cdtype), (b & 0x0F).astype(cdtype) * scales, exact)
        acc += _dot_nt(x_hi_ref[:].astype(cdtype), (b >> 4).astype(cdtype) * scales, exact)
    else:
        w = qs_ref[:].astype(cdtype) * scales
        acc = _dot_nt(x_lo_ref[:].astype(cdtype), w, exact)

    @pl.when(kt == 0)
    def _():
        if xs_ref is None:
            o_ref[:] = acc
        else:
            # affine term over the FULL row: y += xs @ (off*sc - mins)^T
            corr = sc_full * np.float32(q_offset) if q_offset else None
            if has_mins:
                corr = -mn_full if corr is None else corr - mn_full
            # the affine term is a TINY dot: full precision is free
            o_ref[:] = acc + _dot_nt(xs_ref[:], corr, not fast)

    @pl.when(kt != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def _pick_tiles(n: int, kb: int, s: int) -> tuple[int, int]:
    """(n_tile, kb_tile): qs byte-tile is (n_tile, kb_tile), kb_tile = tc*S.

    Prefer covering the whole byte row in ONE k-tile (kb_tile == kb): then the
    activation block's index map is constant across the grid and Pallas
    fetches x exactly once — with multiple k-tiles, x re-streams once per
    n-tile (a ~20% HBM tax at K=14336)."""
    tb = kb // s  # byte-columns per t-position
    t_chunk = 1
    for cand in (16, 8, 4, 2, 1):
        if tb % cand == 0 and cand * s <= 8192:
            t_chunk = cand
            break
    kb_tile = t_chunk * s
    # VMEM budget: the f32 dequant intermediate (n_tile, kb_tile) plus the
    # double-buffered byte tile must fit scoped VMEM (~16 MB) — cap the tile
    # byte area at 2M (~12 MB live).
    n_tile = min(n, 512)
    while n % n_tile or (n_tile > 8 and n_tile * kb_tile > 2 * 1024 * 1024):
        n_tile //= 2
    # wide superblock rows add s-proportional scratch (code unpack, sc/mn
    # expansion): at (n_tile=256, s=864) — the 32B-class down projection —
    # Mosaic's scoped allocation lands 128 KB over the 16 MB limit. Cap the
    # scale-row area; shapes with s <= 512 (8B/14B) keep their tiles.
    while n_tile > 8 and n_tile * s > 128 * 1024:
        n_tile //= 2
    return max(n_tile, 8), kb_tile


def pallas_eligible(shape: tuple[int, int], sub: int, layout: str,
                    gsub: int = 1) -> bool:
    n, k = shape
    if k % 256 or n % 8:
        return False
    s = k // sub
    if s % 8 or s % gsub:
        return False  # scale row must be loadable as (n_tile, S) tiles
    kb = k // 2 if layout == "nib4" else k
    if kb % s:
        return False
    return True


@functools.lru_cache(maxsize=None)
def _build_qmm(b: int, n: int, k: int, layout: str, q_offset: int, sub: int,
               has_mins: bool, fast: bool, gsub: int, packed: bool = False,
               exact: bool = False):
    s = k // sub
    kb = k // 2 if layout == "nib4" else k  # qs bytes per row
    n_tile, kb_tile = _pick_tiles(n, kb, s)
    t_chunk = kb_tile // s
    n_kb_tiles = kb // kb_tile
    nib4 = layout == "nib4"
    affine = has_mins or q_offset != 0
    grouped = gsub > 1
    g = s // gsub

    grid = (n // n_tile, n_kb_tiles)
    kernel = functools.partial(
        _qmm_kernel,
        layout=layout,
        q_offset=q_offset,
        t_chunk=t_chunk,
        has_mins=has_mins,
        grouped=grouped,
        packed=packed,
        fast=fast,
        exact=exact,
    )

    sc_spec = pl.BlockSpec((n_tile, s), lambda nt, kt: (nt, 0), memory_space=pltpu.VMEM)
    mn_spec = (pl.BlockSpec((n_tile, s // 2), lambda nt, kt: (nt, 0),
                            memory_space=pltpu.VMEM) if packed else sc_spec)
    d_spec = pl.BlockSpec((n_tile, g), lambda nt, kt: (nt, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((b, kb_tile), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
    ]
    if nib4:  # second view of x: the high-nibble half, offset by K/2
        in_specs.append(
            pl.BlockSpec((b, kb_tile), lambda nt, kt: (0, kt + n_kb_tiles),
                         memory_space=pltpu.VMEM)
        )
    if affine:
        in_specs.append(pl.BlockSpec((b, s), lambda nt, kt: (0, 0), memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((n_tile, kb_tile), lambda nt, kt: (nt, kt),
                                 memory_space=pltpu.VMEM))
    in_specs.append(sc_spec)
    if has_mins:
        in_specs.append(mn_spec)
    if grouped:
        in_specs.append(d_spec)
        if has_mins and not packed:  # packed: dmin rides inside d
            in_specs.append(d_spec)

    # drop unused refs so the kernel signature matches in_specs
    def kernel_wrap(*refs):
        i = 0
        x_lo = refs[i]; i += 1
        x_hi = refs[i] if nib4 else None
        i += 1 if nib4 else 0
        xs = refs[i] if affine else None
        i += 1 if affine else 0
        qs = refs[i]; i += 1
        sc = refs[i]; i += 1
        mn = refs[i] if has_mins else None
        i += 1 if has_mins else 0
        d = refs[i] if grouped else None
        i += 1 if grouped else 0
        dm = refs[i] if grouped and has_mins and not packed else None
        i += 1 if grouped and has_mins and not packed else 0
        o = refs[i]
        kernel(x_lo, x_hi, xs, qs, sc, mn, d, dm, o)

    flops = 2 * b * n * k
    sc_bytes = 1 if grouped else 4
    if packed:
        bytes_accessed = n * kb + n * s + n * (s // 2) + n * g * 4 + b * k * 4
    else:
        bytes_accessed = (n * kb + n * s * sc_bytes * (2 if has_mins else 1)
                          + (n * g * 4 * (2 if has_mins else 1) if grouped else 0)
                          + b * k * 4)

    def _fn(x, xs, qs, scales, mins, d, dmin):
        args = [x]
        if nib4:
            args.append(x)  # same buffer, two block views
        if affine:
            args.append(xs)
        args.append(qs)
        args.append(scales)
        if has_mins:
            args.append(mins)
        if grouped:
            args.append(d)
            if has_mins and not packed:
                args.append(dmin)
        return pl.pallas_call(
            kernel_wrap,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((b, n_tile), lambda nt, kt: (0, nt),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                # the packed-layout down-projection tile (n_tile=256,
                # S=432) with the repeat-based scale expansion lands
                # ~116 KB over Mosaic's conservative 16 MB scoped-VMEM
                # default; the v5e has 128 MB of physical VMEM, so give
                # the kernel a little headroom instead of shrinking the
                # tile (which costs real bandwidth on every shape)
                vmem_limit_bytes=24 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=int(bytes_accessed), transcendentals=0
            ),
            interpret=_interpret(),
        )(*args)

    return _fn


def qmatmul_pallas(x: jax.Array, qt: QTensor, out_dtype=None, fast: bool | None = None) -> jax.Array:
    """x: (..., K) @ dequant(qt)(N, K)^T -> (..., N). Requires a kernel-packed
    QTensor (kperm=True, see QTensor.from_host); falls back to XLA otherwise."""
    if not getattr(qt, "kperm", False):
        return qmatmul_xla(x, qt, out_dtype)
    n, k = qt.n_rows, qt.n_cols  # per-shard view, not the logical aux shape
    s = k // qt.sub

    lead = x.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    # wide prompts are compute-bound, not weight-bandwidth-bound: past this
    # row count, dequant-once + one MXU GEMM (the XLA path) beats the
    # streaming kernel — and the streaming kernel's whole-row x block
    # (b, K) f32 would blow VMEM past ~b=256 anyway. 0 disables the
    # fallback (decode always streams regardless of width).
    xla_min_b = int(os.environ.get("PRIMA_QMM_XLA_MIN_B", "32"))
    if xla_min_b and b >= xla_min_b:
        return qmatmul_xla(x, qt, out_dtype)
    x2 = permute_x(x.reshape(b, k).astype(jnp.float32), qt.sub, qt.gsub)
    # PRIMA_QMM_PAD8=0 keeps the true row count instead of padding to 8
    # (Mosaic pads sublanes internally). Measured NO faster at the 14B
    # model level (40.2 vs 41.2 tok/s, experiments/decode14b_r5.json) —
    # the b=1 operand costs Mosaic relayout work that outweighs the saved
    # pad op — so the padded layout stays the default.
    if os.environ.get("PRIMA_QMM_PAD8", "1") == "1":
        b_pad = max(8, -(-b // 8) * 8)
    else:
        b_pad = b if b <= 8 else -(-b // 8) * 8
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, b_pad - b), (0, 0)))
    # per-sub-block sums for the affine term (tiny; fused by XLA)
    has_mins = qt.mins is not None
    affine = has_mins or qt.q_offset != 0
    xs = x2.reshape(b_pad, qt.sub, s).sum(axis=1) if affine else None

    if fast is None:
        fast = os.environ.get("PRIMA_QMM_FAST", "0") == "1"
    exact = os.environ.get("PRIMA_QMM_EXACT", "0") == "1" and not fast
    fn = _build_qmm(b_pad, n, k, qt.layout, qt.q_offset, qt.sub, has_mins,
                    fast, qt.gsub, getattr(qt, "packed", False), exact)
    out = fn(x2, xs, qt.qs, qt.scales, qt.mins, qt.d, qt.dmin)
    out = out[:b].reshape(lead + (n,))
    return out.astype(out_dtype or x.dtype)


def register():
    from ...models.llama import register_matmul_impl

    register_matmul_impl("pallas", qmatmul_pallas)


register()
