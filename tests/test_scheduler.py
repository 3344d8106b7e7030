"""MILP layer-assignment scheduler (the assign_layers_to_device analogue)."""

import pytest

from prima_tpu.profiler.device import DeviceProfile
from prima_tpu.profiler.model_cost import ModelCost
from prima_tpu.sched import (
    InfeasibleError,
    assign_layers,
    assign_layers_and_select_devices,
)

GiB = 1 << 30


def _prof(tflops=100.0, hbm_bw=800.0, hbm_free=16 * GiB, h2d=5.0,
          ram=64 * GiB, disk=1.0):
    return DeviceProfile(
        platform="tpu", flops_bf16=tflops, flops_f32=tflops / 2,
        flops_q4k_dequant=tflops / 2, hbm_bw=hbm_bw, h2d_bw=h2d,
        host_ram_bw=50.0, disk_seq_bw=disk, disk_rand_bw=disk / 10,
        hbm_total=hbm_free, hbm_free=hbm_free,
        host_ram_total=ram, host_ram_avail=ram,
        dispatch_latency_s=1e-4,
    )


def _cost(n_layers=32, layer_mb=170, head_mb=800):
    return ModelCost(
        n_layers=n_layers,
        layer_flops={12: 2 * 200e6},  # Q4_K-ish
        head_flops={12: 2 * 500e6},
        layer_bytes=layer_mb * 2**20,
        head_bytes=head_mb * 2**20,
        largest_tensor_bytes=60 * 2**20,
        n_params=8_000_000_000,
        n_embd_k_gqa=1024,
        n_embd_v_gqa=1024,
    )


def test_homogeneous_valid_assignment():
    """With identical devices the batch-1 ring latency is split-invariant
    (the objective is linear), so any valid split is optimal — the same
    property the reference's model has. Check validity, not balance."""
    profs = [_prof() for _ in range(4)]
    res = assign_layers(profs, _cost(32), n_ctx=4096)
    assert sum(res.w) * res.k == 32
    assert all(0 <= n <= w for n, w in zip(res.n, res.w))
    # whole model fits every HBM: resident layers == window everywhere work is
    assert all(n == w for n, w in zip(res.n, res.w))


def test_single_device_takes_all():
    res = assign_layers([_prof()], _cost(32), n_ctx=4096)
    assert res.w == [32 // res.k]
    assert res.objective < 0.1  # sane seconds/token estimate


def test_fast_device_gets_more_layers():
    fast = _prof(hbm_bw=1600.0, tflops=200.0)
    slow = _prof(hbm_bw=200.0, tflops=25.0)
    res = assign_layers([fast, slow], _cost(32), n_ctx=4096)
    assert res.w[0] > res.w[1]


def test_hbm_capacity_forces_streaming():
    # HBM fits only ~6 layers of 170MB*32... make hbm_free tiny
    small = _prof(hbm_free=1 * GiB)
    res = assign_layers([small], _cost(32), n_ctx=512)
    # cannot keep all 32 layers resident: n < w
    assert res.n[0] < res.w[0]
    assert res.device_class[0] in ("STREAM", "DISK")


def test_weak_device_removed():
    # the reference's weak flag is w==1 && n==0 (@1451-1455): a device with
    # no usable device memory at all gets exactly that and is dropped
    good = _prof()
    awful = _prof(tflops=0.01, hbm_bw=0.5, h2d=0.001, hbm_free=GiB // 16,
                  ram=1 * GiB, disk=0.01)
    res = assign_layers_and_select_devices([good, awful], _cost(32), n_ctx=1024)
    assert res.w[1] == 0  # dropped, scattered back as zero
    assert sum(res.w) * res.k == 32


def test_master_never_removed():
    awful = _prof(tflops=0.05, hbm_bw=2.0, h2d=0.01, hbm_free=GiB, ram=4 * GiB)
    good = _prof()
    res = assign_layers_and_select_devices([awful, good], _cost(32), n_ctx=1024)
    assert res.w[0] >= 0  # master stays in the result (may get few layers)
    assert sum(res.w) * res.k == 32


def test_force_k():
    profs = [_prof() for _ in range(2)]
    res = assign_layers(profs, _cost(32), n_ctx=1024, force_k=4)
    assert res.k == 4
    assert sum(res.w) == 8


def test_master_priority_pulls_work():
    profs = [_prof(), _prof()]
    hi = assign_layers(profs, _cost(32), n_ctx=1024, master_priority=2.0, force_k=1)
    lo = assign_layers(profs, _cost(32), n_ctx=1024, master_priority=0.5, force_k=1)
    assert hi.w[0] >= lo.w[0]


def test_infeasible_raises():
    # nothing can hold even one layer
    p = _prof(hbm_free=1 * 2**20, ram=2 * 2**20, disk=0.0, h2d=0.0)
    p.host_ram_avail = 2 * 2**20
    with pytest.raises(InfeasibleError):
        assign_layers([p], _cost(32), n_ctx=4096, force_k=1)


def test_overload_forces_fit_reiteration():
    """The M4-force analogue (@1476-1496): a device whose window exceeds
    host RAM (DISK class) gets forced into FIT when another device has free
    HBM — streaming over-commit instead of paying disk latency."""
    # two devices; device 1 has tiny host RAM -> DISK at any even split,
    # but device 0 has plenty of free HBM
    good = _prof()
    tight = _prof(tflops=50, hbm_bw=400, h2d=5.0, hbm_free=8 * GiB,
                  ram=GiB // 2, disk=0.5)
    res = assign_layers([good, tight], _cost(32), n_ctx=512)
    # the forced-FIT path keeps the tight device participating (w >= 1)
    # without classifying it DISK
    assert res.w[1] >= 1
    assert res.device_class[1] != "DISK"


def test_all_divisors_k_search():
    """k candidates are all divisors of L up to L/2 (find_factors,
    common.cpp:1043-1050) — a 30-layer model must consider k=15."""
    # make streaming essentially free vs resident so large k is harmless,
    # then force k=15 to prove it is representable and feasible
    profs = [_prof() for _ in range(2)]
    res = assign_layers(profs, _cost(30), n_ctx=512, force_k=15)
    assert res.k == 15 and sum(res.w) == 2


def test_macos_uses_random_disk_bw():
    """Disk latency uses rand-read BW on non-Linux (common.cpp:1030-1040)."""
    from prima_tpu.sched.milp import _disk_bw

    lin = _prof(disk=2.0)
    lin.os = "Linux"
    mac = _prof(disk=2.0)
    mac.os = "Darwin"
    assert _disk_bw(lin) == 2.0
    assert _disk_bw(mac) == pytest.approx(0.2)


def test_master_priority_pushes_work_away():
    """master_priority < 1 inflates the master's cost so layers move OFF
    rank 0 (common.cpp:1280, common.h:172)."""
    profs = [_prof(), _prof()]
    pull = assign_layers(profs, _cost(32), n_ctx=512, master_priority=10.0)
    push = assign_layers(profs, _cost(32), n_ctx=512, master_priority=0.1)
    assert pull.w[0] > push.w[0]


def test_compute_buf_bound_scales_with_model():
    """The activation bound tracks model dims (reference @21930-22095),
    not a fixed fudge: bigger ff/heads/vocab -> bigger bound."""
    small = _cost(32)
    small.n_embd, small.n_ff, small.n_heads, small.n_vocab = 1024, 2816, 16, 32000
    big = _cost(32)
    big.n_embd, big.n_ff, big.n_heads, big.n_vocab = 8192, 28672, 64, 128256
    assert big.compute_buf_bytes(4096) > small.compute_buf_bytes(4096) * 4
    # master adds the vocab logits buffer
    assert small.compute_buf_bytes(4096, is_master=True) > \
        small.compute_buf_bytes(4096, is_master=False)


def test_measured_hop_cost_feeds_xi():
    """VERDICT r2 #6: the comm term must come from measured interconnect
    figures, and a slower hop must shift the schedule toward fewer ring
    cycles (each cycle pays one more round of hops)."""
    cost = _cost(32, layer_mb=400)

    def prof_with_hop(gbs, lat):
        p = _prof(hbm_free=4 * GiB)  # model does NOT fit: k > 1 is useful
        p.tcp_hop_gbs = gbs
        p.tcp_hop_lat_s = lat
        return p

    fast = [prof_with_hop(10.0, 20e-6) for _ in range(4)]
    slow = [prof_with_hop(0.001, 0.25) for _ in range(4)]  # 250 ms/hop
    res_fast = assign_layers(fast, cost, n_ctx=2048)
    res_slow = assign_layers(slow, cost, n_ctx=2048)
    # the slow interconnect must not choose MORE cycles than the fast one,
    # and with 250ms hops a single cycle must win outright
    assert res_slow.k <= res_fast.k
    assert res_slow.k == 1
    # objective reflects the measured hop cost (4 hops * 250 ms minimum)
    assert res_slow.objective >= 1.0


def test_hop_cost_falls_back_to_dispatch_proxy():
    p = _prof()
    assert p.tcp_hop_gbs == 0 and p.ici_hop_gbs == 0
    res = assign_layers([p for _ in range(2)], _cost(32), n_ctx=2048)
    assert sum(res.w) * res.k == 32  # proxy path still schedules
