"""Distributed bootstrap over a real multi-process TCP ring — the analogue
of the reference's multi-container Docker simulation (README.md:232-268)."""

import multiprocessing as mp
import os
import socket

import pytest

from prima_tpu.profiler.device import DeviceProfile
from prima_tpu.profiler.model_cost import ModelCost

pytestmark = pytest.mark.slow  # multi-process/e2e tier (ci/run.sh --runslow)

GiB = 1 << 30


def _prof(tflops=100.0, hbm=800.0, free=2 * GiB):
    # 2 GiB HBM holds ~11 of the 32 layers: the solver must spread the model
    # across the ring (with 16 GiB one device hosts everything, which the
    # linear ring-latency objective correctly prefers)
    return DeviceProfile(platform="tpu", flops_bf16=tflops, flops_f32=tflops / 2,
                         flops_q4k_dequant=tflops / 2, hbm_bw=hbm, h2d_bw=5.0,
                         host_ram_bw=50.0, disk_seq_bw=1.0, disk_rand_bw=0.1,
                         hbm_total=free, hbm_free=free, host_ram_total=64 * GiB,
                         host_ram_avail=64 * GiB, dispatch_latency_s=1e-4)


def _cost():
    return ModelCost(n_layers=32, layer_flops={12: 4e8}, head_flops={12: 1e9},
                     layer_bytes=170 * 2**20, head_bytes=800 * 2**20,
                     largest_tensor_bytes=60 * 2**20, n_params=8_000_000_000,
                     n_embd_k_gqa=1024, n_embd_v_gqa=1024)


def _free_port_base():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    base = s.getsockname()[1]
    s.close()
    return base + 100


def _rank_main(rank, world, base, weak_rank, q):
    # child process: build the ring, run the bootstrap, report the result
    from prima_tpu.parallel.bootstrap import RingConfig, RingNode, bootstrap

    prof = _prof(tflops=0.01, hbm=0.5, free=GiB // 4) if rank == weak_rank else _prof()
    if rank == weak_rank:
        prof.host_ram_avail = prof.host_ram_total = 1 * GiB
        prof.h2d_bw = 0.001
        prof.disk_seq_bw = 0.01
    node = RingNode(RingConfig(rank=rank, world=world, data_port=base))
    try:
        node.connect_ring()
        res = bootstrap(node, prof, _cost(), n_ctx=1024)
        q.put((rank, res.rank, res.world, res.w, res.k, res.is_active))
    finally:
        node.close()


@pytest.mark.parametrize("world,weak_rank", [(2, -1), (4, -1), (4, 2)])
def test_multiprocess_bootstrap(world, weak_rank):
    mp_ctx = mp.get_context("spawn")
    base = _free_port_base()
    q = mp_ctx.Queue()
    procs = [mp_ctx.Process(target=_rank_main, args=(r, world, base, weak_rank, q))
             for r in range(world)]
    for p in procs:
        p.start()
    results = {}
    for _ in range(world):
        rank, new_rank, new_world, w, k, active = q.get(timeout=180)
        results[rank] = (new_rank, new_world, w, k, active)
    for p in procs:
        p.join(timeout=30)
        assert p.exitcode == 0

    # all ranks agree on the assignment
    worlds = {v[1] for v in results.values()}
    assert len(worlds) == 1
    new_world = worlds.pop()
    ws = {tuple(v[2]) for v in results.values()}
    assert len(ws) == 1
    w = list(ws.pop())
    k = {v[3] for v in results.values()}.pop()
    assert sum(w) * k == 32

    if weak_rank >= 0:
        # the weak device must have been dropped and everyone renumbered
        assert not results[weak_rank][4]  # is_active False
        assert new_world == world - 1
        active_new_ranks = sorted(v[0] for r, v in results.items() if v[4])
        assert active_new_ranks == list(range(new_world))
    else:
        assert new_world == world


def _manual_rank_main(rank, base, q):
    from prima_tpu.parallel.bootstrap import RingConfig, RingNode, bootstrap

    node = RingNode(RingConfig(rank=rank, world=2, data_port=base))
    try:
        node.connect_ring()
        res = bootstrap(node, _prof(), _cost(),
                        manual_w=[24, 8] if rank == 0 else None)
        q.put((rank, res.w, res.k))
    finally:
        node.close()


def test_manual_layer_window():
    """-lw manual mode skips the solver (README FAQ #1)."""
    mp_ctx = mp.get_context("spawn")
    base = _free_port_base()
    q = mp_ctx.Queue()
    procs = [mp_ctx.Process(target=_manual_rank_main, args=(r, base, q))
             for r in range(2)]
    for p in procs:
        p.start()
    out = {}
    for _ in range(2):
        rank, w, k = q.get(timeout=60)
        out[rank] = (w, k)
    for p in procs:
        p.join(timeout=30)
    assert set(out) == {0, 1}
    assert out[0][0] == [24, 8] and out[1][0] == [24, 8]


def test_is_port_open():
    from prima_tpu.parallel.bootstrap import is_port_open

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    s.listen(1)
    port = s.getsockname()[1]
    assert is_port_open("127.0.0.1", port)
    s.close()
    assert not is_port_open("127.0.0.1", port)
