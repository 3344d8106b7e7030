"""prima-quantize — GGUF -> GGUF re-quantization.

The analogue of examples/quantize + llama_model_quantize_internal
(src/llama.cpp:19614): every 2-D weight tensor is (de)quantized to the
target ftype; 1-D tensors (norms, biases) stay f32; the token embedding and
output head get the ftype's designated types (Q4_K_M keeps output at Q6_K,
mirroring the reference's per-tensor rules).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFModel
from ..gguf.writer import GGUFWriter
from ..quant.dequant_np import dequantize_tensor
from ..quant.quantize_np import quantize

# ftype name -> (default weight type, output/embd type)
FTYPES: dict[str, tuple[GGMLType, GGMLType]] = {
    "Q4_0": (GGMLType.Q4_0, GGMLType.Q6_K),
    "Q4_1": (GGMLType.Q4_1, GGMLType.Q6_K),
    "Q5_0": (GGMLType.Q5_0, GGMLType.Q6_K),
    "Q5_1": (GGMLType.Q5_1, GGMLType.Q6_K),
    "Q8_0": (GGMLType.Q8_0, GGMLType.Q8_0),
    "Q2_K": (GGMLType.Q2_K, GGMLType.Q6_K),
    "Q3_K": (GGMLType.Q3_K, GGMLType.Q6_K),
    "Q4_K": (GGMLType.Q4_K, GGMLType.Q6_K),
    "Q4_K_M": (GGMLType.Q4_K, GGMLType.Q6_K),
    "Q5_K": (GGMLType.Q5_K, GGMLType.Q6_K),
    "Q5_K_M": (GGMLType.Q5_K, GGMLType.Q6_K),
    "Q6_K": (GGMLType.Q6_K, GGMLType.Q6_K),
    "IQ4_NL": (GGMLType.IQ4_NL, GGMLType.Q6_K),
    "IQ4_XS": (GGMLType.IQ4_XS, GGMLType.Q6_K),
    "IQ2_XXS": (GGMLType.IQ2_XXS, GGMLType.Q5_K),
    "IQ2_XS": (GGMLType.IQ2_XS, GGMLType.Q5_K),
    "IQ2_S": (GGMLType.IQ2_S, GGMLType.Q5_K),
    "IQ3_XXS": (GGMLType.IQ3_XXS, GGMLType.Q5_K),
    "IQ3_S": (GGMLType.IQ3_S, GGMLType.Q5_K),
    "IQ1_S": (GGMLType.IQ1_S, GGMLType.Q5_K),
    "IQ1_M": (GGMLType.IQ1_M, GGMLType.Q5_K),
    # ternary (BitNet b1.58); token-embd/output fall back to Q4_K
    # (llama_model_quantize_internal @19331-19333)
    "TQ1_0": (GGMLType.TQ1_0, GGMLType.Q4_K),
    "TQ2_0": (GGMLType.TQ2_0, GGMLType.Q4_K),
    "F16": (GGMLType.F16, GGMLType.F16),
    "BF16": (GGMLType.BF16, GGMLType.BF16),
    "F32": (GGMLType.F32, GGMLType.F32),
}


def _target_type(name: str, ne, default: GGMLType, out_type: GGMLType) -> GGMLType:
    if len([d for d in ne if d > 1]) < 2:
        return GGMLType.F32  # norms / biases stay f32
    if name in ("output.weight", "token_embd.weight"):
        return out_type
    # Q4_K_M-style bump: attn_v and ffn_down are quality-critical
    if default == GGMLType.Q4_K and (".attn_v." in name or ".ffn_down." in name):
        return GGMLType.Q6_K
    return default


def _encode(x: np.ndarray, t: GGMLType,
            qw: np.ndarray | None = None) -> tuple[np.ndarray | bytes, GGMLType]:
    if t == GGMLType.F32:
        return x.astype(np.float32), t
    if t == GGMLType.F16:
        return x.astype(np.float16), t
    try:
        if qw is not None:
            from ..quant.quantize_imatrix import quantize_weighted

            return quantize_weighted(x, t, qw), t
        return quantize(x, t), t
    except (NotImplementedError, ValueError):
        # row size incompatible with the block format: keep f16
        return x.astype(np.float16), GGMLType.F16


def quantize_gguf(src_path: str, dst_path: str, ftype: str,
                  imatrix: dict | None = None, logfile=sys.stderr) -> dict:
    """imatrix: name -> per-column importance (from quantize_imatrix.
    load_imatrix) — enables activation-weighted encoding for K-quants, the
    analogue of llama-quantize --imatrix."""
    default_t, out_t = FTYPES[ftype.upper()]
    src = GGUFModel.open(src_path)
    w = GGUFWriter(dst_path)
    for key, val in src.metadata.items():
        if key == "general.file_type":
            continue
        w.add_kv(key, val)
    w.add_kv("general.file_type", int(default_t))

    stats = {"n_tensors": 0, "in_bytes": 0, "out_bytes": 0}
    t0 = time.time()
    for name, ti in src.tensors.items():
        x = dequantize_tensor(ti).astype(np.float32)
        t = _target_type(name, ti.ne, default_t, out_t)
        qw = imatrix.get(name) if imatrix else None
        if qw is not None and len(qw) != ti.ne[0]:
            qw = None  # shape mismatch (e.g. different model): ignore
        data, t = _encode(x, t, qw)
        if isinstance(data, np.ndarray) and t in (GGMLType.F32, GGMLType.F16):
            w.add_tensor(name, data)
        else:
            w.add_tensor(name, data, ne=ti.ne, ggml_type=t)
        stats["n_tensors"] += 1
        stats["in_bytes"] += ti.nbytes
        stats["out_bytes"] += len(data) if isinstance(data, bytes) else data.nbytes
        print(f"[{stats['n_tensors']:4d}] {name:40s} {ti.ggml_type.name:8s}"
              f" -> {t.name:8s}", file=logfile)
    w.write()
    stats["seconds"] = time.time() - t0
    src.close()
    return stats


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="prima-quantize", description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("ftype", choices=sorted(FTYPES), help="target ftype")
    ap.add_argument("--imatrix", help="importance matrix file (prima-imatrix)")
    args = ap.parse_args(argv)
    imatrix = None
    if args.imatrix:
        from ..quant.quantize_imatrix import load_imatrix

        imatrix = load_imatrix(args.imatrix)
        print(f"loaded {len(imatrix)} imatrix entries from {args.imatrix}",
              file=sys.stderr)
    stats = quantize_gguf(args.src, args.dst, args.ftype, imatrix=imatrix)
    print(f"quantized {stats['n_tensors']} tensors: "
          f"{stats['in_bytes'] / 2**20:.1f} MiB -> {stats['out_bytes'] / 2**20:.1f} MiB "
          f"in {stats['seconds']:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
