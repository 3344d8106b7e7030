"""Round-5: pinpoint the 14B decode deficit (VERDICT r4 task 2).

Round 4 measured 36.5 tok/s on the 14B shape = 0.84x baseline while the
8B and 32B shapes beat theirs — so one of the 14B matmuls (K=5120 or
K=13824 reductions, 20/54 superblocks vs the 8B's 16/56) loses ~20%.
This runs the r4 DMA-vs-VPU roofline over EVERY per-layer matmul shape of
both models, same throttle window, and writes experiments/roofline_r5.json
so the result is committed (r4's gap: the harness existed, the JSON
didn't).

Shapes (rows, K):   8B                14B
  wqkv              (6144, 4096)      (7168, 5120)
  wo                (4096, 4096)      (5120, 5120)
  gateup            (28672, 4096)     (27648, 5120)
  down              (4096, 14336)     (5120, 13824)

Requires the tunneled TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kernel_roofline_r4 import run_shape  # noqa: E402

SHAPES = [
    ("8b_wqkv", 6144, 4096),
    ("8b_wo", 4096, 4096),
    ("8b_gateup", 28672, 4096),
    ("8b_down", 4096, 14336),
    ("14b_wqkv", 7168, 5120),
    ("14b_wo", 5120, 5120),
    ("14b_gateup", 27648, 5120),
    ("14b_down", 5120, 13824),
]


def main():
    import jax

    out = {"backend": jax.default_backend(),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "shapes": {}}
    only = os.environ.get("PRIMA_ROOFLINE_ONLY")
    for name, n, k in SHAPES:
        if only and only not in name:
            continue
        try:
            rep = run_shape(n, k)
        except Exception as e:  # noqa: BLE001
            rep = {"shape": [n, k], "error": str(e)[:300]}
        out["shapes"][name] = rep
        print(json.dumps({name: rep}), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
