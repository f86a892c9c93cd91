"""Pallas TPU kernel: radius-bounded K-nearest-neighbour via candidate tiles.

The stage-2 hot op (SURVEY.md §7.2; reference pykeops ``Kmin_argKmin`` at
lib/temporalpoints.py:432-437) has a radius cutoff downstream: the consumer
rejects any sample whose kth neighbour lies beyond ``sqrt(radius2)``
(lib/temporalpoints.py:440). That bound makes a spatial prefilter *exact*:
a point tile whose bounding box is further than ``radius`` from a query
block's bounding box cannot contribute a neighbour the caller keeps.

Design (vs the brute-force kernel in knn_pallas.py):
  * points Morton-sorted into spatially compact tiles of ``PTS`` and kept
    **entirely VMEM-resident** as ``[T, 3, PTS]`` (~0.2 MB for 10^4 points);
    the tiling is exposed separately (``build_point_tables``) so per-frame
    rendering builds it ONCE and every ray chunk reuses it;
  * queries Morton-sorted (normalised by the *point* bbox so padded queries
    can't wreck the code scale) — or pre-sorted by the caller
    (``sort_queries=False``, e.g. aggregate_pts' Morton-ordered
    compaction); XLA precomputes each query block's candidate-tile list
    from bbox gaps (~25% of tiles survive on real workloads), shipped as a
    per-block metadata row;
  * the kernel consumes candidates in rounds of ``RT`` tiles. Selection
    uses **packed int32 keys** (d2 high bits | lane) and a *write-free*
    ascending-min extraction: with unique keys, the (j+1)th best is
    ``min(key > mj)`` — one compare + select + min per extraction, no
    argmin, no scatter, no buffer mutation. The winner's buffer lane comes
    from the key's low bits; its point index from the round's tile ids.
  * selection is exact up to ties within 2^-11 relative distance (12 key
    bits carry the lane); returned distances are the quantized key values
    (ascending), sufficient for the kth-neighbour radius threshold.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn_pallas import _interpret_mode

QB = 256          # queries per block
GB = 4            # query blocks per grid step (amortises per-step overhead)
PTS = 128         # points per tile
RT = 24           # tiles per selection round (most blocks need one round)
LMASK = 0xFFF     # 12 lane bits (candidate width + carry <= 4096)
SENT = 0x7F000000  # sentinel key high bits (huge positive float pattern)


def _kernel(k, qb, gb, pts, rt, meta_ref, q_ref, p_hbm, ok_ref, oi_ref,
            kbuf, p_scr, p_sem):
    # the point table is identical for every grid step; with a plain VMEM
    # BlockSpec Mosaic re-DMAs it per block (~80 us x n_blocks dominated the
    # kernel). Copy it once into persistent scratch on the first block.
    @pl.when(pl.program_id(0) == 0)
    def _():
        cp = pltpu.make_async_copy(p_hbm, p_scr, p_sem)
        cp.start()
        cp.wait()
    p_ref = p_scr
    tail = jax.lax.broadcasted_iota(jnp.int32, (qb, 128), 1)
    # gb query blocks per grid step: the remaining per-step cost (~50 us of
    # block fetch/writeback machinery) amortises over gb blocks
    for g in range(gb):
        _block(k, qb, pts, rt, g, meta_ref, q_ref, p_ref, ok_ref, oi_ref,
               kbuf, tail)


def _block(k, qb, pts, rt, g, meta_ref, q_ref, p_ref, ok_ref, oi_ref, kbuf,
           tail):
    cw = rt * pts
    shift = pts.bit_length() - 1                    # log2(pts)
    q = q_ref[g * qb:(g + 1) * qb]                  # [qb, 3]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    n = meta_ref[0, g, 0, 0]                        # candidate count

    def round_body(r, carry):
        bkey, bidx = carry                          # [qb, k] int32 each
        tids = []
        for s in range(rt):
            i = r * rt + s
            tid = meta_ref[0, g, (i + 1) >> 7, (i + 1) & 127]
            tids.append(tid)

            @pl.when(i < n)
            def _():
                p = p_ref[tid]                      # [3, pts]
                dx = qx - p[0:1, :]
                dy = qy - p[1:2, :]
                dz = qz - p[2:3, :]
                d2 = dx * dx + dy * dy + dz * dz    # [qb, pts]
                loc = jax.lax.broadcasted_iota(jnp.int32, (qb, pts), 1)
                kbuf[:, s * pts:(s + 1) * pts] = (
                    (pltpu.bitcast(d2, jnp.int32) & ~LMASK)
                    | (s * pts + loc))

            @pl.when(i >= n)
            def _():
                kbuf[:, s * pts:(s + 1) * pts] = (
                    SENT | (s * pts
                            + jax.lax.broadcasted_iota(jnp.int32, (qb, pts),
                                                       1)))

        # carried best-k re-packed into the aligned tail area
        ins = jnp.full((qb, 128), SENT, jnp.int32)
        for j in range(k):
            ins = jnp.where(tail == j, bkey[:, j:j + 1] & ~LMASK, ins)
        kbuf[:, cw:] = ins | (cw + tail)

        # write-free ascending extraction over unique keys
        buf = kbuf[:, :]
        nk, ni = [], []
        m = jnp.full((qb,), -0x80000000, jnp.int32)
        for j in range(k):
            m = jnp.min(jnp.where(buf > m[:, None], buf, 0x7FFFFFFF), axis=1)
            lane = m & LMASK
            sub = lane >> shift
            loc = lane & (pts - 1)
            tid_w = jnp.zeros_like(lane)
            for s in range(rt):
                tid_w = tid_w + jnp.where(sub == s, tids[s], 0)
            g_round = tid_w * pts + loc
            g_carry = jnp.zeros_like(lane)
            for s in range(k):
                g_carry = g_carry + jnp.where(lane == cw + s, bidx[:, s], 0)
            nk.append(m)
            ni.append(jnp.where(lane < cw, g_round, g_carry))
        return jnp.stack(nk, axis=1), jnp.stack(ni, axis=1)

    n_rounds = (n + rt - 1) // rt
    bkey0 = SENT | (cw + jax.lax.broadcasted_iota(jnp.int32, (qb, k), 1))
    bidx0 = jnp.zeros((qb, k), jnp.int32)
    bkey, bidx = jax.lax.fori_loop(0, n_rounds, round_body, (bkey0, bidx0))
    ok_ref[g * qb:(g + 1) * qb] = bkey
    oi_ref[g * qb:(g + 1) * qb] = bidx


def build_point_tables(points, pts_per_tile: int = PTS):
    """Morton-sort + tile the point cloud for the radius-KNN kernel.

    Per-frame precompute (the warped cloud changes per frame, not per ray
    chunk): returns a dict reused by every ``knn_radius_pallas`` call of
    the frame. Shapes are static given the point count.
    """
    from ..ops.knn import morton_codes
    # the kernels decode packed selection keys with shift/mask arithmetic
    # (lane & (pts-1)); a non-power-of-two tile would decode garbage
    assert pts_per_tile > 0 and pts_per_tile & (pts_per_tile - 1) == 0, \
        f"knn_pts_tile must be a power of two, got {pts_per_tile}"
    pf = points.astype(jnp.float32)
    P = pf.shape[0]
    p_lo = pf.min(0)
    p_hi = pf.max(0)
    perm = jnp.argsort(morton_codes(pf, p_lo, p_hi))
    pts = pf[perm]
    ppad = (-P) % pts_per_tile
    if ppad:
        pts = jnp.concatenate(
            [pts, jnp.full((ppad, 3), 1e9, jnp.float32)], axis=0)
    T = (P + ppad) // pts_per_tile
    assert T < 1023, "point set too large for the metadata row"
    tiles = pts.reshape(T, pts_per_tile, 3)
    return {
        "pts_t": jnp.transpose(tiles, (0, 2, 1)),   # [T, 3, pts_per_tile]
        "pts_sorted": pts,                          # [T*pts] (padded)
        "t_lo": tiles.min(1),                       # [T, 3]
        "t_hi": tiles.max(1),                       # pad rows only loosen lb
        "perm": perm,
        "p_lo": p_lo,
        "p_hi": p_hi,
    }


def _count_kernel(qb, gb, pts, rt, r2, meta_ref, q_ref, p_hbm, oc_ref,
                  p_scr, p_sem):
    """Per-query count of candidate points with d2 <= r2 (no selection).

    ONE distance pass per candidate tile — no key packing, no k extraction
    passes — so ``count >= k`` decides the kth-neighbour radius cutoff
    EXACTLY (every point within the radius lies in a candidate tile) at a
    fraction of the full kernel's cost. Counts accumulate as a [qb, pts]
    lane vector (elementwise adds); the cross-lane reduce happens once in
    XLA on the partial-count output.
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        cp = pltpu.make_async_copy(p_hbm, p_scr, p_sem)
        cp.start()
        cp.wait()
    p_ref = p_scr
    for g in range(gb):
        q = q_ref[g * qb:(g + 1) * qb]
        qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        n = meta_ref[0, g, 0, 0]

        def round_body(r, cnt):
            for s in range(rt):
                i = r * rt + s
                tid = meta_ref[0, g, (i + 1) >> 7, (i + 1) & 127]
                p = p_ref[tid]                      # [3, pts]
                dx = qx - p[0:1, :]
                dy = qy - p[1:2, :]
                dz = qz - p[2:3, :]
                d2 = dx * dx + dy * dy + dz * dz
                cnt = cnt + jnp.where((d2 <= r2) & (i < n), 1, 0)
            return cnt

        n_rounds = (n + rt - 1) // rt
        cnt = jax.lax.fori_loop(0, n_rounds, round_body,
                                jnp.zeros((qb, pts), jnp.int32))
        oc_ref[g * qb:(g + 1) * qb] = cnt


def _prep_queries(qf, tables, radius2, qb, gb):
    """Shared query padding/blocking + per-block candidate-tile metadata."""
    t_lo = tables["t_lo"]
    t_hi = tables["t_hi"]
    T = t_lo.shape[0]
    M = qf.shape[0]
    mpad = (-M) % (qb * gb)
    q = jnp.pad(qf, ((0, mpad), (0, 0)), constant_values=2e9)
    NB = (M + mpad) // qb
    NG = NB // gb
    qblk = q.reshape(NB, qb, 3)
    q_lo = qblk.min(1)
    q_hi = qblk.max(1)
    gap = jnp.maximum(jnp.maximum(q_lo[:, None, :] - t_hi[None],
                                  t_lo[None] - q_hi[:, None, :]), 0.0)
    cand = (gap * gap).sum(-1) < radius2            # [NB, T]
    order = jnp.argsort(~cand, axis=1, stable=True).astype(jnp.int32)
    cnt = cand.sum(1).astype(jnp.int32)
    meta = jnp.concatenate([cnt[:, None], order], axis=1)
    meta = jnp.pad(meta, ((0, 0), (0, 1024 - 1 - T))).reshape(NG, gb, 8, 128)
    return meta, q, NG, NB


@partial(jax.jit, static_argnames=("radius2", "sort_queries", "qb", "gb",
                                   "rt"))
def knn_count_pallas(queries, points, radius2: float = 0.01,
                     sort_queries: bool = True, tables=None, qb: int = QB,
                     gb: int = GB, rt: int = RT):
    """Exact per-query count of points with d2 <= radius2 -> int32 [M].

    ``count >= k`` is exactly the consumer's kth-neighbour radius cutoff
    (reference lib/temporalpoints.py:440) with NO quantization band: the
    counting pass compares exact fp32 distances. Use as a cheap phase-1
    filter before the full selection kernel.
    """
    M = queries.shape[0]
    qf = queries.astype(jnp.float32)
    if tables is None:
        tables = build_point_tables(points)
    pts_t = tables["pts_t"]
    T, _, pts_tile = pts_t.shape
    if sort_queries:
        from ..ops.knn import morton_codes
        qperm = jnp.argsort(morton_codes(qf, tables["p_lo"], tables["p_hi"]))
        qf = qf[qperm]
    meta, q, NG, NB = _prep_queries(qf, tables, radius2, qb, gb)
    out = pl.pallas_call(
        partial(_count_kernel, qb, gb, pts_tile, rt, float(radius2)),
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, gb, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((gb * qb, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((gb * qb, pts_tile), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB * qb, pts_tile), jnp.int32),
        scratch_shapes=[pltpu.VMEM((T, 3, pts_tile), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=_interpret_mode(),
    )(meta, q, pts_t)
    cnt = out[:M].sum(-1)
    if sort_queries:
        inv = jnp.argsort(qperm)
        return cnt[inv]
    return cnt


@partial(jax.jit, static_argnames=("k", "radius2", "sort_queries",
                                   "remap_indices", "qb", "gb", "rt"))
def knn_radius_pallas(queries, points, k: int = 8, radius2: float = 0.01,
                      sort_queries: bool = True, tables=None,
                      remap_indices: bool = True, qb: int = QB, gb: int = GB,
                      rt: int = RT):
    """Radius-bounded k-NN: (d2 [M, k] ascending, idx [M, k]).

    Every neighbour with d2 < radius2 is found (up to 2^-11-relative
    selection ties); neighbours beyond radius2 may be reported as missing
    (d2 ~ 3e38, idx arbitrary). Exact for consumers that reject samples
    whose kth neighbour exceeds the radius (aggregate_pts' ``nn_ok`` cutoff
    == reference lib/temporalpoints.py:440). Returned d2 are the ascending
    selection keys: exact distances truncated to 11 mantissa bits.

    ``sort_queries=False`` skips the internal Morton sort + unsort of the
    queries (caller already ordered them spatially). ``tables``: per-frame
    ``build_point_tables(points)`` output; pass it to skip the per-call
    point sort/tiling. ``remap_indices=False`` returns indices into the
    Morton-SORTED point order (``tables["perm"]``) — the [M, k] remap
    gather runs at the TPU gather floor (~30 ms at M=295k) while callers
    can pre-permute their per-point arrays (P=1e4 rows) for free.
    """
    assert k <= 16
    M = queries.shape[0]
    P = points.shape[0]
    qf = queries.astype(jnp.float32)

    if tables is None:
        tables = build_point_tables(points)
    pts_t = tables["pts_t"]
    t_lo = tables["t_lo"]
    t_hi = tables["t_hi"]
    perm = tables["perm"]
    T, _, pts_tile = pts_t.shape
    if k > 8:
        # the unrolled write-free extraction's Mosaic stack scales with
        # qb * k (measured: k=12/qb=256 needs 18.2-19.9M at ANY rt vs the
        # 16M scoped-VMEM limit; qb=128 fits for k<=12, qb=64 for k<=16 —
        # scripts/probe_k12.py). Shrink the query block, and bound the
        # candidate width too (it no longer dominates but still adds).
        qb = min(qb, 128 if k <= 12 else 64)
        rt = max(1, min(rt, (8 * RT * PTS) // (k * pts_tile)))
    assert rt * pts_tile + 128 <= LMASK + 1, "lane bits overflow"
    ppad = T * pts_tile - P

    # ---- queries: Morton sort (point-bbox normalised), pad, block bbox,
    # candidate-tile metadata (exact under the radius bound)
    if sort_queries:
        from ..ops.knn import morton_codes
        qperm = jnp.argsort(morton_codes(qf, tables["p_lo"], tables["p_hi"]))
        qf = qf[qperm]
    meta, q, NG, NB = _prep_queries(qf, tables, radius2, qb, gb)

    bw = rt * pts_tile + 128
    out = pl.pallas_call(
        partial(_kernel, k, qb, gb, pts_tile, rt),
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, gb, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((gb * qb, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((gb * qb, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb * qb, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB * qb, k), jnp.int32),
            jax.ShapeDtypeStruct((NB * qb, k), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((qb, bw), jnp.int32),
                        pltpu.VMEM((T, 3, pts_tile), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=_interpret_mode(),
    )(meta, q, pts_t)

    # unpack ascending quantized distances from the keys (the consumer only
    # thresholds the kth distance; the 2^-11-relative truncation is the
    # documented tie tolerance). Sentinel keys unpack to ~3e38 (rejected).
    okey, oi = out
    d2 = jax.lax.bitcast_convert_type(okey[:M] & ~LMASK, jnp.float32)
    oi = oi[:M]
    if remap_indices:
        idx = jnp.concatenate([perm, jnp.zeros(ppad, perm.dtype)])[oi]
    else:
        idx = oi
    d2 = jnp.maximum(d2, 0.0)

    if sort_queries:
        inv = jnp.argsort(qperm)
        return d2[inv], idx[inv]
    return d2, idx
