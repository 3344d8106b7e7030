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
    good = _prof()
    awful = _prof(tflops=0.01, hbm_bw=0.5, h2d=0.001, hbm_free=GiB // 4,
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
