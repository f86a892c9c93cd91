"""Pallas TPU kernel: fused brute-force K-nearest-neighbour (K=8).

The stage-2 hot op (SURVEY.md §7.2): for every ray sample, the 8 nearest
warped cloud points. The XLA formulation (ops/knn.py) pays for a full
``lax.top_k`` sort per point tile; this kernel keeps a running best-8 per
query block in VMEM and merges each point tile with 8 masked min/argmin
passes — no sort, no HBM round-trips for the distance matrix.

Grid: (query_blocks, point_tiles); point tiles iterate innermost so the
running best-8 lives in the output block across the reduction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 256      # queries per block
PT = 2048     # points per tile


def _interpret_mode() -> bool:
    """Interpret Pallas off-TPU: the kernels become CPU-runnable so CI can
    exactness-test them without a chip (tests/test_kernels_interpret.py).
    Interpret mode is slow — off-TPU only tests call these."""
    from ..ops.knn import _tpu_default
    return not _tpu_default()


def _knn_kernel(k: int, radius2: float, q_ref, p_ref, od_ref, oi_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        od_ref[:] = jnp.full(od_ref.shape, jnp.inf, jnp.float32)
        oi_ref[:] = jnp.zeros(oi_ref.shape, jnp.int32)

    q = q_ref[:]                                   # [QB, 3]
    p = p_ref[:]                                   # [PT, 3]

    # block-level pruning: if the axis-aligned gap between the query block's
    # bbox and this (Morton-sorted, hence spatially compact) point tile's
    # bbox already exceeds every query's current kth-best distance, the tile
    # cannot contribute — skip the whole merge.
    q_lo = jnp.min(q, axis=0)
    q_hi = jnp.max(q, axis=0)
    p_lo = jnp.min(p, axis=0)
    p_hi = jnp.max(p, axis=0)
    gap = jnp.maximum(jnp.maximum(q_lo - p_hi, p_lo - q_hi), 0.0)
    lb2 = jnp.sum(gap * gap)
    worst = jnp.max(od_ref[:, k - 1])
    if radius2 is not None:
        # exact when the consumer discards neighbours beyond radius2: a
        # tile with bbox gap >= radius2 can only contribute neighbours the
        # caller rejects (see aggregate_pts' nn_ok cutoff)
        worst = jnp.minimum(worst, radius2)

    @pl.when((j == 0) | (lb2 < worst))
    def _():
        # exact fp32 distances on the VPU: the MXU matmul expansion runs at
        # bf16 precision on TPU and visibly reorders close neighbours
        dx = q[:, 0:1] - p[:, 0][None, :]
        dy = q[:, 1:2] - p[:, 1][None, :]
        dz = q[:, 2:3] - p[:, 2][None, :]
        d2 = dx * dx + dy * dy + dz * dz           # [QB, PT]
        gidx = j * PT + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)

        cand_d = jnp.concatenate([od_ref[:], d2], axis=1)
        cand_i = jnp.concatenate([oi_ref[:], gidx], axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)

        best_d = []
        best_i = []
        for _ in range(k):
            m = jnp.min(cand_d, axis=1)
            am = jnp.argmin(cand_d, axis=1)
            sel = lane == am[:, None]
            best_d.append(m)
            best_i.append(jnp.sum(jnp.where(sel, cand_i, 0), axis=1))
            cand_d = jnp.where(sel, jnp.inf, cand_d)
        od_ref[:] = jnp.stack(best_d, axis=1)
        oi_ref[:] = jnp.stack(best_i, axis=1)


@partial(jax.jit, static_argnames=("k", "radius2"))
def knn_pallas(queries, points, k: int = 8, radius2=None):
    """Exact k-NN: (d2 [M, k] ascending, idx [M, k]).

    ``radius2``: optional squared-distance bound — neighbours beyond it may
    be reported as missing (inf); exact for consumers that reject them.
    Inputs are padded to block multiples; pad points get distance ~1e20 and
    never win.
    """
    M = queries.shape[0]
    P = points.shape[0]
    mpad = (-M) % QB
    ppad = (-P) % PT
    q = jnp.pad(queries.astype(jnp.float32), ((0, mpad), (0, 0)))
    p = points.astype(jnp.float32)
    if ppad:
        p = jnp.concatenate(
            [p, jnp.full((ppad, 3), 1e10, jnp.float32)], axis=0)
    n_qb = (M + mpad) // QB
    n_pt = (P + ppad) // PT

    d2, idx = pl.pallas_call(
        partial(_knn_kernel, k, radius2),
        grid=(n_qb, n_pt),
        in_specs=[
            pl.BlockSpec((QB, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PT, 3), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QB, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QB, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M + mpad, k), jnp.float32),
            jax.ShapeDtypeStruct((M + mpad, k), jnp.int32),
        ],
        interpret=_interpret_mode(),
    )(q, p)
    return jnp.maximum(d2[:M], 0.0), idx[:M]


def _morton_codes(points):
    from ..ops.knn import morton_codes
    return morton_codes(points)


@partial(jax.jit, static_argnames=("k", "radius2", "sort_queries"))
def knn_pallas_sorted(queries, points, k: int = 8, radius2=None,
                      sort_queries: bool = True):
    """knn_pallas over Morton-sorted points (and optionally queries):
    spatially compact blocks on both sides make the kernel's bbox pruning
    effective."""
    perm = jnp.argsort(_morton_codes(points))
    pts = points[perm]
    if sort_queries:
        qperm = jnp.argsort(_morton_codes(queries))
        d2s, sis = knn_pallas(queries[qperm], pts, k=k, radius2=radius2)
        inv = jnp.argsort(qperm)
        d2, si = d2s[inv], sis[inv]
    else:
        d2, si = knn_pallas(queries, pts, k=k, radius2=radius2)
    return d2, perm[si]


def available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
