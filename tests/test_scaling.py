"""Scaling-efficiency projection formulas (profiler/scaling.py) — the
analytical multi-chip substitute for the reference's measured cluster
table (/root/reference/README.md:37-61; BASELINE >=80% target)."""

from prima_tpu.profiler.scaling import (ICI_V5E_NOMINAL, HopProfile,
                                        capacity_projection,
                                        pipeline_projection, project_all,
                                        ring_allreduce_seconds,
                                        tp_projection)


def test_pipeline_free_hop_is_perfectly_efficient():
    free = HopProfile(gbs=1e9, lat_s=0.0, name="free")
    r = pipeline_projection(0.012, 4, free, 8192)
    assert r["efficiency"] == 1.0
    assert abs(r["pipelined_tok_s"] - 4 / 0.012) < 1.0
    # single stream can't beat one chip (no overlap possible at batch 1)
    assert r["single_stream_tok_s"] <= 1 / 0.012 + 1e-6


def test_pipeline_ici_meets_80pct_target():
    # the BASELINE.md >=80% scaling-efficiency bar, at the measured 8B rate
    for n in (2, 4, 8):
        r = pipeline_projection(0.0119, n, ICI_V5E_NOMINAL, 8192)
        assert r["efficiency"] >= 0.8
        assert r["efficiency_no_overlap"] >= 0.8


def test_pipeline_slow_hop_degrades():
    slow = HopProfile(gbs=0.01, lat_s=5e-3, name="slow")
    r = pipeline_projection(0.012, 8, slow, 8192)
    assert r["efficiency"] < 0.8
    assert r["single_stream_ms_tok"] > 12.0


def test_ring_allreduce_limits():
    hop = HopProfile(gbs=45.0, lat_s=1e-6)
    assert ring_allreduce_seconds(1 << 20, 1, hop) == 0.0
    t2 = ring_allreduce_seconds(1 << 20, 2, hop)
    t8 = ring_allreduce_seconds(1 << 20, 8, hop)
    assert 0 < t2 < t8  # more steps, more latency terms


def test_tp_latency_bound_at_batch1():
    # TP cuts single-stream latency but pays 2 all-reduces per layer;
    # with nominal ICI it still wins latency vs one chip
    r = tp_projection(0.012, 4, ICI_V5E_NOMINAL, 8192, n_layers=32)
    assert r["tok_s"] > 1 / 0.012
    assert 0 < r["efficiency"] <= 1.0


def test_capacity_projection_70b():
    # 39.8 GB of Q4_K: does not fit 1 or 2 chips at 13 GB usable; fits 4.
    one = capacity_projection(39.8e9, 1, 13e9, 819.0, 10.0)
    four = capacity_projection(39.8e9, 4, 13e9, 819.0, 10.0)
    assert one["host_streamed_gb"] > 25
    assert four["host_streamed_gb"] == 0.0
    assert four["tok_s"] > 50 * one["tok_s"] / 60  # resident >> streamed
    assert four["ms_tok"] < 15.0  # ~12 ms: crushes the 674 ms baseline


def test_project_all_shape():
    out = project_all(11.9, 4096, 32, 4.6, baseline_ms_tok=15.0,
                      dcn=HopProfile(gbs=1.0, lat_s=5e-5, name="dcn"))
    assert len(out["pipeline_ici"]) == 3
    assert len(out["pipeline_dcn"]) == 3
    assert out["vs_baseline_best_pipeline"] > 1.0
    # DCN pipeline is strictly worse than ICI at every width
    for a, b in zip(out["pipeline_ici"], out["pipeline_dcn"]):
        assert a["efficiency"] >= b["efficiency"]
