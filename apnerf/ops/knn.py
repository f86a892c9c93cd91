"""Exact brute-force K-nearest-neighbour search, TPU-tiled.

Replaces the reference's pykeops ``LazyTensor.argKmin / Kmin_argKmin``
reductions (lib/temporalpoints.py:106-110, 433-437, 747-751). The distance
computation is expressed in matmul form (MXU-friendly) and the point set is
streamed in tiles through a running top-k, so the full [M, P] distance matrix
is never materialised.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _tpu_default() -> bool:
    """True when computation lands on a TPU-like backend by default (the
    Pallas kernel path); respects an explicit jax_default_device override."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", "") in ("tpu", "axon")
    return jax.default_backend() in ("tpu", "axon")


def morton_codes(points, lo=None, hi=None):
    """30-bit Morton codes (10 bits/axis) for spatial ordering.

    ``lo``/``hi`` fix the normalisation box (so e.g. padded or sentinel
    rows can't wreck the code scale); default is the point bbox.
    """
    if lo is None:
        lo = points.min(0)
    if hi is None:
        hi = points.max(0)
    u = jnp.clip((points - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
    g = jnp.minimum((u * 1024.0).astype(jnp.uint32), 1023)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    return (spread(g[:, 0]) | (spread(g[:, 1]) << 1)
            | (spread(g[:, 2]) << 2))


def _pad_points(points, tile):
    P = points.shape[0]
    pad = (-P) % tile
    if pad:
        points = jnp.concatenate(
            [points, jnp.full((pad, points.shape[1]), 1e10, points.dtype)], 0)
    return points, P + pad


def _knn_block(queries, pts_tiles, k: int, tile: int):
    """Exact k-NN of a query block against all point tiles (scan)."""
    q_sq = jnp.sum(queries ** 2, axis=-1, keepdims=True)          # [M, 1]
    M = queries.shape[0]
    init_d = jnp.full((M, k), jnp.inf, jnp.float32)
    init_i = jnp.zeros((M, k), jnp.int32)

    def body(carry, inp):
        best_d, best_i = carry
        t_idx, pts = inp
        p_sq = jnp.sum(pts ** 2, axis=-1)                          # [tile]
        # d2 = |q|^2 + |p|^2 - 2 q.p ; the q.p term rides the MXU. HIGHEST
        # precision: the K=3 contraction is tiny but the cancellation in the
        # expansion needs full fp32 (TPU default matmul precision is bf16).
        cross = jnp.matmul(queries, pts.T,
                           precision=jax.lax.Precision.HIGHEST)    # [M, tile]
        d2 = q_sq + p_sq[None, :] - 2.0 * cross
        idx = t_idx * tile + jnp.arange(tile, dtype=jnp.int32)[None, :]
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(idx, d2.shape)], axis=1)
        neg_top, pos = jax.lax.top_k(-cat_d, k)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (-neg_top, new_i), None

    (best_d, best_i), _ = jax.lax.scan(
        body, (init_d, init_i),
        (jnp.arange(pts_tiles.shape[0], dtype=jnp.int32), pts_tiles))
    return best_d, best_i


@partial(jax.jit, static_argnames=("k", "tile", "q_tile", "radius2",
                                   "assume_sorted", "sorted_point_idx", "rt"))
def knn(queries, points, k: int = 8, tile: int = 2048, q_tile: int = 16384,
        radius2=None, assume_sorted: bool = False, point_tables=None,
        sorted_point_idx: bool = False, rt: int = 24):
    """K nearest points for each query, tiled over both operands.

    On TPU this dispatches to the fused Pallas kernel
    (apnerf.kernels.knn_pallas); the XLA scan+top_k formulation below is the
    portable reference path (CPU tests, interpreters).

    Args:
      queries: [M, 3] float32 (tiled in blocks of ``q_tile`` via lax.map so
        only a [q_tile, tile] distance block is ever live).
      points:  [P, 3] float32, streamed in ``tile``-sized chunks.
      k: number of neighbours.
      assume_sorted: perf hint — the caller already ordered queries
        spatially (Morton), so the TPU kernels skip their internal query
        sort + unsort (the hoisting saves two M-sized argsorts per call).

    Returns:
      (d2 [M, k], idx [M, k]) — squared distances (ascending) and indices.
    """
    if _tpu_default() and k <= 16:
        if radius2 is not None:
            from ..kernels.knn_cells_pallas import knn_radius_pallas
            return knn_radius_pallas(queries, points, k=k,
                                     radius2=float(radius2),
                                     sort_queries=not assume_sorted,
                                     tables=point_tables,
                                     remap_indices=not sorted_point_idx,
                                     rt=rt)
        from ..kernels.knn_pallas import knn_pallas_sorted
        return knn_pallas_sorted(queries, points, k=k, radius2=radius2,
                                 sort_queries=not assume_sorted)
    if sorted_point_idx:
        # callers gather from Morton-SORTED per-point tables — the brute
        # path must search the sorted/padded point array so its indices
        # live in the same space (silent index-space corruption otherwise,
        # e.g. k > 16 falling off the kernel path on TPU)
        assert point_tables is not None, \
            "sorted_point_idx=True requires point_tables"
        points = point_tables["pts_sorted"]
    queries = queries.astype(jnp.float32)
    points, Ppad = _pad_points(points.astype(jnp.float32), tile)
    pts_tiles = points.reshape(Ppad // tile, tile, 3)

    M = queries.shape[0]
    if M <= q_tile:
        best_d, best_i = _knn_block(queries, pts_tiles, k, tile)
    else:
        pad = (-M) % q_tile
        if pad:
            queries = jnp.concatenate(
                [queries, jnp.zeros((pad, 3), jnp.float32)], 0)
        q_blocks = queries.reshape(-1, q_tile, 3)
        best_d, best_i = jax.lax.map(
            lambda q: _knn_block(q, pts_tiles, k, tile), q_blocks)
        best_d = best_d.reshape(-1, k)[:M]
        best_i = best_i.reshape(-1, k)[:M]
    # exact distances can come out slightly negative from the matmul form
    return jnp.maximum(best_d, 0.0), best_i


@partial(jax.jit, static_argnames=("tile", "q_tile", "radius2",
                                   "assume_sorted", "rt"))
def knn_count(queries, points, radius2, tile: int = 2048,
              q_tile: int = 16384, assume_sorted: bool = False,
              point_tables=None, rt: int = 24):
    """Per-query count of points with squared distance <= radius2 -> [M].

    ``count >= k`` is EXACTLY the kth-neighbour radius cutoff the
    reference applies downstream of its KNN (lib/temporalpoints.py:440)
    — one distance pass decides it without any selection work, so this is
    the cheap phase-1 of a two-phase KNN (count-filter, compact, then run
    the full selection kernel on survivors only)."""
    if _tpu_default():
        from ..kernels.knn_cells_pallas import knn_count_pallas
        return knn_count_pallas(queries, points, radius2=float(radius2),
                                sort_queries=not assume_sorted,
                                tables=point_tables, rt=rt)
    queries = queries.astype(jnp.float32)
    points, Ppad = _pad_points(points.astype(jnp.float32), tile)
    pts_tiles = points.reshape(Ppad // tile, tile, 3)

    def count_block(q):
        def body(cnt, pts):
            d2 = ((q[:, None, :] - pts[None]) ** 2).sum(-1)
            return cnt + (d2 <= radius2).sum(-1).astype(jnp.int32), None
        cnt, _ = jax.lax.scan(body, jnp.zeros((q.shape[0],), jnp.int32),
                              pts_tiles)
        return cnt

    M = queries.shape[0]
    if M <= q_tile:
        return count_block(queries)
    pad = (-M) % q_tile
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.full((pad, 3), 1e9, jnp.float32)], 0)
    out = jax.lax.map(count_block, queries.reshape(-1, q_tile, 3))
    return out.reshape(-1)[:M]


@partial(jax.jit, static_argnames=("tile",))
def nn1(queries, points, tile: int = 2048):
    """1-NN squared distance + index (chamfer building block)."""
    d2, idx = knn(queries, points, k=1, tile=tile)
    return d2[:, 0], idx[:, 0]


def chamfer(pcd1, pcd2):
    """Symmetric squared-distance chamfer terms (raw, like
    ``get_chamfer_loss(..., get_raw=True)``, lib/temporalpoints.py:738-763)."""
    d1, _ = nn1(pcd1, pcd2)
    d2, _ = nn1(pcd2, pcd1)
    return d1, d2


def batch_chamfer(pcd1, pcd2):
    """Batched symmetric chamfer loss (lib/temporalpoints.py:765-795).

    pcd1: [B, N, 2or3]; pcd2: [B, M, 2or3]. Dense pairwise distances per
    batch element (N, M ~ 3000 -> the [N, M] tile fits comfortably).
    """
    d = jnp.sum((pcd1[:, :, None, :] - pcd2[:, None, :, :]) ** 2, axis=-1)
    return d.min(axis=2).mean() + d.min(axis=1).mean()
