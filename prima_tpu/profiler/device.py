"""Device profiler: per-chip/per-host micro-benchmarks.

The TPU analogue of the reference's device profiler (common/profiler.cpp):

  reference metric                      TPU metric here
  ----------------                      ---------------
  per-dtype matmul FLOPS (CPU/GPU)      per-dtype matmul TFLOPS on the chip
  RAM bandwidth                         host RAM bandwidth (numpy)
  VRAM bandwidth                        HBM bandwidth (on-chip copy/reduce)
  mem copy delay                        host->HBM transfer bandwidth
  disk seq/rand speed (via fio)         disk seq/rand read (direct, no fio)
  physical/swap memory (sysinfo)        host RAM / swap (/proc, cgroup-aware)
  VRAM total/free (cuda/metal API)      HBM stats (device.memory_stats)

All device timing amortizes dispatch inside one jit and synchronizes via
value readback (tunneled-TPU rule; see .claude/skills/verify/SKILL.md).
Serialization (to_dict/from_dict) supports the multi-host all-gather the
way device_info serialization does (profiler.cpp:2393).
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass, field

import numpy as np


@dataclass
class DeviceProfile:
    hostname: str = ""
    platform: str = ""  # tpu | cpu | ...
    os: str = ""  # Linux | Darwin | ... (device_os, reference profiler.h)
    device_kind: str = ""
    n_devices: int = 1
    # compute (TFLOPS per matmul dtype-path)
    flops_bf16: float = 0.0
    flops_f32: float = 0.0
    flops_q4k_dequant: float = 0.0  # fused dequant-matmul path
    # bandwidths (GB/s)
    hbm_bw: float = 0.0
    h2d_bw: float = 0.0
    host_ram_bw: float = 0.0
    disk_seq_bw: float = 0.0
    disk_rand_bw: float = 0.0
    ici_bw: float = 0.0  # inter-chip (0 when single device)
    # interconnect hop characteristics feeding the scheduler's comm term
    # (the reference measures device-to-device copy delay,
    # common/profiler.cpp:1216, and folds it into the MILP cost)
    ici_hop_gbs: float = 0.0  # ppermute neighbor-exchange bandwidth
    ici_hop_lat_s: float = 0.0  # per-hop fixed latency (small payload)
    tcp_hop_gbs: float = 0.0  # wire-plane (ring_tcp) hop bandwidth
    tcp_hop_lat_s: float = 0.0  # wire-plane per-hop latency
    # memory (bytes)
    hbm_total: int = 0
    hbm_free: int = 0
    host_ram_total: int = 0
    host_ram_avail: int = 0
    host_swap_total: int = 0
    # latency
    dispatch_latency_s: float = 0.0

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "DeviceProfile":
        return cls(**{k: v for k, v in d.items() if k in cls.__dataclass_fields__})


def _sync(x) -> None:
    np.asarray(x)  # value readback forces remote completion


def _time_jit(fn, *args, reps: int = 3) -> float:
    out = fn(*args)
    _sync(out if not isinstance(out, tuple) else out[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out if not isinstance(out, tuple) else out[0])
        best = min(best, time.perf_counter() - t0)
    return best


def _bench_matmul_flops(dtype, n: int = 4096, inner: int = 8) -> float:
    """TFLOPS of an n^3 matmul chain (the device_flops analogue,
    profiler.cpp:165: one 4096^2 matmul per dtype)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.float32).astype(dtype)
    b = jax.random.normal(key, (n, n), jnp.float32).astype(dtype)

    @jax.jit
    def chain(a, b):
        def body(i, a):
            return jnp.dot(a, b, preferred_element_type=a.dtype) * jnp.asarray(1e-3, a.dtype)
        return jax.lax.fori_loop(0, inner, body, a)

    dt = _time_jit(chain, a, b)
    return 2.0 * n * n * n * inner / dt / 1e12


def _bench_qmm_flops(n: int = 4096, k: int = 4096, inner: int = 8) -> float:
    """Fused dequant-matmul decode-GEMV path (the Q4_K vec_dot analogue)."""
    import jax
    import jax.numpy as jnp

    from ..gguf.constants import GGMLType
    from ..models.llama import synth_qtensor_device
    from ..quant.pallas.qmatmul import qmatmul_pallas

    qt = synth_qtensor_device(jax.random.PRNGKey(1), n, k, GGMLType.Q4_K)

    @jax.jit
    def chain(x):
        def body(i, x):
            y = qmatmul_pallas(x, qt)
            return y[:, :k] * 1e-3
        return jax.lax.fori_loop(0, inner, body, x)

    x = jnp.ones((1, k), jnp.float32)
    dt = _time_jit(chain, x)
    return 2.0 * n * k * inner / dt / 1e12


def _bench_hbm_bw(mb: int = 256, inner: int = 8) -> float:
    """HBM read bandwidth via a big reduction chain (GB/s)."""
    import jax
    import jax.numpy as jnp

    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def chain(x):
        def body(i, acc):
            return acc + jnp.sum(x * (1.0 + acc * 0.0))
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

    dt = _time_jit(chain, x)
    return mb / 1024 * inner / dt

def _bench_h2d_bw(mb: int = 64) -> float:
    """Host->device transfer bandwidth (GB/s) — the mem-copy-delay analogue."""
    import jax

    x = np.ones(mb * 1024 * 1024, dtype=np.uint8)
    d = jax.device_put(x)
    _sync(d[:1])
    t0 = time.perf_counter()
    d = jax.device_put(x)
    _sync(d[:1])
    dt = time.perf_counter() - t0
    return mb / 1024 / dt


def _bench_host_ram_bw(mb: int = 512) -> float:
    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    t0 = time.perf_counter()
    b = a.copy()
    dt = time.perf_counter() - t0
    del b
    return 2 * mb / 1024 / dt  # read + write


def _bench_disk(path: str = None, mb: int = 64) -> tuple[float, float]:
    """Sequential and random read bandwidth (GB/s) — replaces the external
    fio dependency (profiler.cpp:927) with direct O_DIRECT-free reads."""
    import tempfile

    path = path or tempfile.gettempdir()
    fname = os.path.join(path, f".prima_disk_bench_{os.getpid()}")
    data = np.random.default_rng(0).integers(0, 255, mb * 1024 * 1024, dtype=np.uint8)
    try:
        with open(fname, "wb") as f:
            f.write(data.tobytes())
            f.flush()
            os.fsync(f.fileno())
        # drop what page cache we can by reading a different large buffer
        t0 = time.perf_counter()
        with open(fname, "rb") as f:
            while f.read(1 << 20):
                pass
        seq = mb / 1024 / (time.perf_counter() - t0)
        # random 4K reads
        n_reads = 512
        rng = np.random.default_rng(1)
        offsets = rng.integers(0, mb * 1024 * 1024 - 4096, n_reads)
        t0 = time.perf_counter()
        with open(fname, "rb") as f:
            for off in offsets:
                f.seek(int(off))
                f.read(4096)
        rand = n_reads * 4096 / 1024**3 / (time.perf_counter() - t0)
        return seq, rand
    finally:
        try:
            os.unlink(fname)
        except OSError:
            pass


def _bench_ici_hop(sizes_mb=(1, 16)) -> tuple[float, float]:
    """ppermute neighbor-exchange microbench over all local devices:
    returns (GB/s per hop at the large payload, per-hop latency from the
    small one). The mesh analogue of the reference's device-to-device
    copy-delay bench (common/profiler.cpp:1216). 0s when single-device."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    n = len(devs)
    if n < 2:
        return 0.0, 0.0
    mesh = Mesh(np.asarray(devs), ("x",))
    perm = [(i, (i + 1) % n) for i in range(n)]

    def run(bytes_total):
        elems = max(bytes_total // 4 // n, 256)

        @jax.jit
        def fn(x):
            def body(x):
                def step(i, y):
                    return jax.lax.ppermute(y, "x", perm) + 1.0
                return jax.lax.fori_loop(0, 8, step, x)
            return shard_map(body, mesh=mesh, in_specs=P("x"),
                             out_specs=P("x"))(x).sum()

        x = jnp.ones((n * elems,), jnp.float32)
        _sync(fn(x))
        t0 = time.perf_counter()
        _sync(fn(x))
        dt = (time.perf_counter() - t0) / 8
        return elems * 4, dt

    small_bytes, small_dt = run(sizes_mb[0] * 2**20)
    big_bytes, big_dt = run(sizes_mb[1] * 2**20)
    lat = max(small_dt - small_bytes / max(big_bytes / big_dt, 1e-9), 0.0)
    return big_bytes / big_dt / 1e9, lat


def _bench_tcp_hop(payload_mb: int = 8) -> tuple[float, float]:
    """Loopback TCP hop bench for the wire plane (ring_tcp): (GB/s, lat_s).
    Loopback is the upper bound of the local NIC path; multi-host rings
    re-measure against the real peer at bootstrap."""
    import socket
    import threading

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    got = {}

    def serve():
        conn, _ = srv.accept()
        conn.settimeout(10)
        total = 0
        while True:
            b = conn.recv(1 << 20)
            if not b:
                break
            total += len(b)
            if b[-1:] == b"\x01":  # echo marker for latency pings
                conn.sendall(b"\x01")
        got["total"] = total
        conn.close()

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    cli = socket.create_connection(("127.0.0.1", port), timeout=10)
    cli.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    # latency: 16 x 1-byte ping-pong
    lats = []
    for _ in range(16):
        t0 = time.perf_counter()
        cli.sendall(b"\x01")
        assert cli.recv(1) == b"\x01"
        lats.append(time.perf_counter() - t0)
    lat = sorted(lats)[len(lats) // 2] / 2  # one-way
    # bandwidth: one big streamed payload
    payload = b"\x00" * (payload_mb * 2**20)
    t0 = time.perf_counter()
    cli.sendall(payload)
    cli.shutdown(socket.SHUT_WR)
    th.join(timeout=10)
    dt = time.perf_counter() - t0
    cli.close()
    srv.close()
    return len(payload) / dt / 1e9, lat


def _mem_info() -> dict:
    """Host memory, swap; cgroup-aware like the reference's Docker handling
    (profiler.cpp:459-683)."""
    info = {"host_ram_total": 0, "host_ram_avail": 0, "host_swap_total": 0}
    try:
        with open("/proc/meminfo") as f:
            mem = {}
            for line in f:
                parts = line.split()
                mem[parts[0].rstrip(":")] = int(parts[1]) * 1024
        info["host_ram_total"] = mem.get("MemTotal", 0)
        info["host_ram_avail"] = mem.get("MemAvailable", 0)
        info["host_swap_total"] = mem.get("SwapTotal", 0)
    except OSError:
        pass
    # cgroup v2 limit overrides (Docker)
    for limf in ("/sys/fs/cgroup/memory.max", "/sys/fs/cgroup/memory/memory.limit_in_bytes"):
        try:
            with open(limf) as f:
                v = f.read().strip()
            if v.isdigit() and int(v) < info["host_ram_total"]:
                info["host_ram_total"] = int(v)
        except OSError:
            continue
    return info


def profile_device(full: bool = True, bench_disk: bool = True) -> DeviceProfile:
    """Run all micro-benchmarks on the default device (llama_profile_device
    analogue, src/llama.cpp:3621)."""
    import jax
    import socket

    dev = jax.devices()[0]
    import platform as _platform

    p = DeviceProfile(
        hostname=socket.gethostname(),
        platform=jax.default_backend(),
        os=_platform.system(),
        device_kind=dev.device_kind,
        n_devices=jax.device_count(),
    )
    mi = _mem_info()
    p.host_ram_total = mi["host_ram_total"]
    p.host_ram_avail = mi["host_ram_avail"]
    p.host_swap_total = mi["host_swap_total"]
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        pass
    p.hbm_total = stats.get("bytes_limit", 0)
    p.hbm_free = p.hbm_total - stats.get("bytes_in_use", 0)
    if p.hbm_total == 0:
        # memory_stats unavailable (e.g. tunneled runtimes): known HBM sizes
        kind = p.device_kind.lower()
        table = {"v5 lite": 16, "v5e": 16, "v4": 32, "v5p": 95, "v5": 16,
                 "v6e": 32, "v6 lite": 32, "v3": 16, "v2": 8}
        gib = next((g for k, g in table.items() if k in kind), 16)
        if p.platform == "cpu":
            gib = max(int(p.host_ram_avail / 2**30), 1)
        p.hbm_total = gib * 2**30
        p.hbm_free = int(p.hbm_total * 0.95)

    import jax.numpy as jnp

    small = p.platform == "cpu"
    n = 1024 if small else 4096
    p.flops_bf16 = _bench_matmul_flops(jnp.bfloat16, n)
    p.flops_f32 = _bench_matmul_flops(jnp.float32, n)
    if full:
        try:
            p.flops_q4k_dequant = _bench_qmm_flops(2048 if small else 4096,
                                                   2048 if small else 4096)
        except Exception:
            p.flops_q4k_dequant = 0.0
        p.hbm_bw = _bench_hbm_bw(64 if small else 256)
        p.h2d_bw = _bench_h2d_bw(16 if small else 64)
        p.host_ram_bw = _bench_host_ram_bw()
        if bench_disk:
            p.disk_seq_bw, p.disk_rand_bw = _bench_disk()
        # dispatch latency: tiny op round-trip
        one = jnp.zeros(())
        f = jax.jit(lambda x: x + 1)
        _sync(f(one))
        t0 = time.perf_counter()
        for _ in range(5):
            _sync(f(one))
        p.dispatch_latency_s = (time.perf_counter() - t0) / 5
        try:
            p.ici_hop_gbs, p.ici_hop_lat_s = _bench_ici_hop()
        except Exception:
            p.ici_hop_gbs = p.ici_hop_lat_s = 0.0
        try:
            p.tcp_hop_gbs, p.tcp_hop_lat_s = _bench_tcp_hop()
        except Exception:
            p.tcp_hop_gbs = p.tcp_hop_lat_s = 0.0
    return p


def print_device_props(p: DeviceProfile) -> str:
    """The device_print_props capability table (profiler.cpp:1712)."""
    rows = [
        ("host", p.hostname),
        ("platform", f"{p.platform} ({p.device_kind}) x{p.n_devices}"),
        ("matmul bf16", f"{p.flops_bf16:8.2f} TFLOPS"),
        ("matmul f32", f"{p.flops_f32:8.2f} TFLOPS"),
        ("dequant q4_k", f"{p.flops_q4k_dequant:8.2f} TFLOPS"),
        ("HBM bandwidth", f"{p.hbm_bw:8.1f} GB/s"),
        ("host->HBM", f"{p.h2d_bw:8.2f} GB/s"),
        ("host RAM bw", f"{p.host_ram_bw:8.1f} GB/s"),
        ("disk seq / rand", f"{p.disk_seq_bw:6.2f} / {p.disk_rand_bw:.3f} GB/s"),
        ("HBM total/free", f"{p.hbm_total / 2**30:6.1f} / {p.hbm_free / 2**30:.1f} GiB"),
        ("host RAM total/avail", f"{p.host_ram_total / 2**30:6.1f} / {p.host_ram_avail / 2**30:.1f} GiB"),
        ("swap", f"{p.host_swap_total / 2**30:6.1f} GiB"),
        ("dispatch latency", f"{p.dispatch_latency_s * 1e3:8.2f} ms"),
        ("ICI hop bw/lat", f"{p.ici_hop_gbs:6.2f} GB/s / "
                           f"{p.ici_hop_lat_s * 1e6:.0f} us"),
        ("TCP hop bw/lat", f"{p.tcp_hop_gbs:6.2f} GB/s / "
                           f"{p.tcp_hop_lat_s * 1e6:.0f} us"),
    ]
    w = max(len(k) for k, _ in rows)
    return "\n".join(f"| {k:<{w}} | {v} |" for k, v in rows)
