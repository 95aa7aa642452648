"""Device mesh construction and sharding helpers.

The reference scales by running one independent GPU process per host via a
Pyro4 job farm (reference scripts/ina_speech_segmenter_pyro_*.py).  The TPU
replacement is a single engine sharding work across chips with
`jax.sharding` over an ICI mesh: file-level batches are data-parallel, and
the (tiny) models are replicated.  Multi-host deployments layer the job-lease
service (parallel/jobs.py) over DCN on top of the per-host mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="data", devices=None):
    """1-D data-parallel mesh over the first n_devices local devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_2d_mesh(data=None, model=1, devices=None):
    """(data, model) mesh for dp x tp shardings in the training path."""
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devs) // model
    devs = np.array(devs[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def shard_batch(mesh, x, axis="data"):
    """Shard the leading axis of x across the mesh data axis."""
    spec = P(axis, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh, tree):
    """Replicate a pytree (e.g. model params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
