"""Multi-host launch: jax.distributed + the SPMD pipeline across processes.

The TPU-pod path (SURVEY §2.5's "TPU-native equivalent"): every host runs
the same program; jax.distributed.initialize joins them into one runtime
whose global device list backs the (dp, pp, tp) mesh, and the piped-ring
pipeline's ppermute hops ride ICI/DCN. The TCP ring (ring_tcp.py) remains
the fallback for hosts that only share a plain network.

Environment variables (set per process, the reference's -w/-r analogue):
  PRIMA_COORDINATOR  host:port of process 0
  PRIMA_NUM_PROCS    world size
  PRIMA_PROC_ID      this process's id
"""

from __future__ import annotations

import os


def init_multihost(coordinator: str | None = None, num_processes: int | None = None,
                   process_id: int | None = None):
    """Join the jax distributed runtime; returns (global_devices, proc_id)."""
    import jax

    coordinator = coordinator or os.environ.get("PRIMA_COORDINATOR")
    num_processes = num_processes or int(os.environ.get("PRIMA_NUM_PROCS", "1"))
    process_id = process_id if process_id is not None else int(os.environ.get("PRIMA_PROC_ID", "0"))
    if num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes=num_processes,
                                   process_id=process_id)
    return jax.devices(), process_id


def is_multihost() -> bool:
    import jax

    return jax.process_count() > 1
