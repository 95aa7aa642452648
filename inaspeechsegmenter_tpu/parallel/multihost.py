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
        num_processes = os.environ.get("JAX_NUM_PROCESSES")
    if process_id is None:
        process_id = os.environ.get("JAX_PROCESS_ID")
    # pass None through when unset: jax.distributed auto-detects process
    # count/id from the cluster environment (TPU pod metadata, SLURM, ...);
    # defaulting to a 1-process job here would make EVERY pod host claim to
    # be the coordinator of its own single-host job
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=None if num_processes is None else int(num_processes),
        process_id=None if process_id is None else int(process_id))
    return True


def global_mesh(axis="data"):
    """1-D mesh over every device in the (possibly multi-host) job
    (delegates to mesh.make_mesh — ONE owner of the mesh policy)."""
    from .mesh import make_mesh

    return make_mesh(axis=axis)
