"""Round-5: fix the misaligned-scale-row expansion cost (the 14B deficit).

roofline_r5.json showed the fused kernel at 0.71-0.87x of its own
no-scale variant exactly on the shapes whose scale-row length S = K/32 is
NOT a multiple of the 128-lane width (14B: S=160/432; 8B down: S=448),
while lane-aligned shapes (S=128) run at ~1.0x. The suspect is the
in-kernel pltpu.repeat expanding (N_T, S) -> (N_T, t_chunk*S): from a
misaligned source every output lane-tile needs a distinct cross-lane
rotation.

This measures the production qmatmul_pallas on the three 14B shapes and
8b_down under each expansion strategy (PRIMA_QMM_REPEAT):
  direct  — one reps-fold repeat from the misaligned source (round-4 code)
  twostep — repeat to lcm(S,128) lanes first (all the misaligned work),
            then an aligned tile-copy repeat for the rest
  bcast   — broadcast_in_dim + reshape, let Mosaic pick the lowering

Writes experiments/scale_expand_r5.json. Requires the tunneled TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SHAPES = [
    ("14b_gateup", 27648, 5120),
    ("14b_down", 5120, 13824),
    ("14b_wqkv", 7168, 5120),
    ("8b_down", 4096, 14336),
]
# (name, PRIMA_QMM_EXPAND, PRIMA_QMM_REPEAT): r4 baseline = dot+direct.
# bcast was dropped — Mosaic rejects the broadcast_in_dim lowering.
STRATS = (
    ("dot_direct", "dot", "direct"),
    ("rep_direct", "repeat", "direct"),
    ("rep_twostep", "repeat", "twostep"),
)


def time_full(n, k, iters):
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from prima_tpu.gguf.constants import GGMLType
    from prima_tpu.models.llama import synth_qtensor_device
    from prima_tpu.quant.pallas.qmatmul import qmatmul_pallas

    qt = jax.jit(lambda: synth_qtensor_device(jax.random.PRNGKey(0), n, k,
                                              GGMLType.Q4_K))()
    jax.block_until_ready(qt.qs)
    xf = jnp.ones((1, k), jnp.float32)

    @functools.partial(jax.jit, static_argnames=())
    def full(x, qs, scales, mins, d, dmin):
        q2 = dataclasses.replace(qt, qs=qs, scales=scales, mins=mins, d=d,
                                 dmin=dmin)

        def body(i, acc):
            xx, acc = jax.lax.optimization_barrier((x, acc))
            return acc + qmatmul_pallas(xx, q2).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body,
                                 jnp.zeros((1, n), jnp.float32))

    args = (xf, qt.qs, qt.scales, qt.mins, qt.d, qt.dmin)
    _ = jax.block_until_ready(full(*args))
    best = float("inf")
    for _i in range(4):
        t0 = time.perf_counter()
        _ = float(np.asarray(jax.device_get(full(*args))).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    qb = sum(a.size * a.dtype.itemsize for a in
             (qt.qs, qt.scales, qt.mins, qt.d, qt.dmin) if a is not None)
    return qb * iters / best / 1e9


def main():
    import jax

    from prima_tpu.quant.pallas import qmatmul

    iters = int(os.environ.get("PRIMA_ROOFLINE_ITERS", "512"))
    out = {"backend": jax.default_backend(), "iters": iters,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "shapes": {}}
    for name, n, k in SHAPES:
        rep = {}
        for sname, expand, repeat in STRATS:
            os.environ["PRIMA_QMM_EXPAND"] = expand
            os.environ["PRIMA_QMM_REPEAT"] = repeat
            qmatmul._build_qmm.cache_clear()  # env read at trace time
            jax.clear_caches()
            try:
                rep[f"{sname}_gbs"] = round(time_full(n, k, iters), 1)
            except Exception as e:  # noqa: BLE001
                rep[f"{sname}_gbs"] = None
                rep[f"{sname}_error"] = str(e)[:200]
        out["shapes"][name] = rep
        print(json.dumps({name: rep}), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scale_expand_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
