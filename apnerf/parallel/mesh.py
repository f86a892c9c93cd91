"""Device mesh + sharding helpers: data-parallel over rays.

The reference is single-GPU (SURVEY.md §2.3); this layer is new. Design
point (SURVEY.md §5.8): rays are embarrassingly parallel, parameters are
small (the 160^3x12 grid is ~200 MB fp32) — so we *replicate parameters,
shard the ray batch*, and let XLA insert the single ``psum`` for the
gradient reduction over ICI. Points (stage 2) are replicated; the KNN
queries (ray samples) are sharded with the rays.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
feed each process its local shard of the ray batch.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None, backend: Optional[str] = None):
    """1-D mesh over the ray axis."""
    devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (RAY_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(RAY_AXIS))


def put_replicated(tree, mesh: Mesh):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def put_ray_sharded(batch: dict, mesh: Mesh):
    """Place per-ray batch arrays sharded on the leading axis; scalars
    replicated."""
    rs, rep = ray_sharded(mesh), replicated(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 \
                and x.shape[0] % mesh.devices.size == 0:
            return jax.device_put(x, rs)
        return jax.device_put(x, rep)

    return {k: place(v) for k, v in batch.items()}
