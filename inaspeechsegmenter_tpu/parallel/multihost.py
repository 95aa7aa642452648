"""Multi-host (DCN) initialization helpers.

Single-host multi-chip scaling rides ICI via the mesh (mesh.py); multi-host
deployments initialize `jax.distributed` over DCN with these helpers and
then either span a global mesh (for collective workloads) or — for the
embarrassingly-file-parallel segmentation workload — run one engine per host
fed by the TCP job-lease service (jobs.py), which preserves the reference
farm's pull/lease/idempotent-rerun semantics across hosts.
"""

from __future__ import annotations

import os


def init_multihost(coordinator_address=None, num_processes=None,
                   process_id=None):
    """Initialize jax.distributed from args or standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); no-op if
    neither is provided (single host)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    # `is None` (not falsy-or): an explicit process_id=0 — the coordinator —
    # must never be overridden by a stale JAX_PROCESS_ID in the environment
    if num_processes is None:
        num_processes = os.environ.get("JAX_NUM_PROCESSES", 1)
    if process_id is None:
        process_id = os.environ.get("JAX_PROCESS_ID", 0)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes),
        process_id=int(process_id))
    return True


def global_mesh(axis="data"):
    """1-D mesh over every device in the (possibly multi-host) job."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))
