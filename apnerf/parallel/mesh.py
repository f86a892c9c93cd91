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


def put_replicated_arrays(tree, mesh: Mesh):
    """device_put array leaves replicated on the mesh; pass through
    non-array entries (bone lists, None, python scalars) untouched."""
    rep = replicated(mesh)

    def place(x):
        if hasattr(x, "ndim"):
            return jax.device_put(x, rep)
        return x

    return jax.tree_util.tree_map(place, tree)


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


# ---------------------------------------------------------------------------
# ZeRO-1: sharded optimizer state over the same 1-D mesh.
#
# Params stay replicated (the forward needs the whole grid/point cloud on
# every chip) but the Adam moments — 2x the parameter bytes — are sharded.
# Expressed purely through sharding constraints: XLA GSPMD then emits
# reduce-scatter for the gradients feeding the update, runs the elementwise
# Adam update shard-locally, and all-gathers only the updated params. Over
# ICI this costs the same bytes as the all-reduce it replaces (an
# all-reduce IS reduce-scatter + all-gather) while cutting optimizer memory
# by the mesh size — e.g. the 160^3x12 grid's moments go 2x200 MB
# replicated -> 50 MB/chip on 8 chips.
# ---------------------------------------------------------------------------

ZERO1_MIN_SIZE = 8192  # leaves smaller than this stay replicated


def _zero1_spec(shape, n_dev: int, min_size: int) -> P:
    if int(np.prod(shape, dtype=np.int64)) < min_size:
        return P()
    for ax, d in enumerate(shape):
        if d % n_dev == 0 and d >= n_dev:
            return P(*([None] * ax), RAY_AXIS)
    return P()


def zero1_sharding(x, mesh: Mesh,
                   min_size: int = ZERO1_MIN_SIZE) -> NamedSharding:
    """Sharding for one optimizer-state leaf: split the first axis divisible
    by the mesh size; small or indivisible leaves stay replicated."""
    return NamedSharding(
        mesh, _zero1_spec(getattr(x, "shape", ()), mesh.devices.size,
                          min_size))


def put_zero1(tree, mesh: Mesh, min_size: int = ZERO1_MIN_SIZE):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, zero1_sharding(x, mesh, min_size)), tree)


def constrain_zero1(tree, mesh: Mesh, min_size: int = ZERO1_MIN_SIZE):
    """with_sharding_constraint every leaf to its ZeRO-1 sharding (use
    inside jit, on gradients and on the updated optimizer state)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(
            x, zero1_sharding(x, mesh, min_size)), tree)


def constrain_replicated(tree, mesh: Mesh):
    """with_sharding_constraint every leaf back to replicated (use on the
    updated params so the next forward sees whole arrays)."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, s), tree)
