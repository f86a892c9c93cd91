"""Pallas TPU kernel: sorted window accumulation (fast scatter-add).

XLA's scatter runs at ~118M updates/s on TPU regardless of index order
(PERF.md) — far below what the voxel-grid gradient needs. This kernel
replaces it for the *sorted* case: contributions are pre-sorted by target
row; the kernel walks contiguous windows of the output, streams the
window's update rows through VMEM via manual DMA, and accumulates with
one-hot MXU matmuls (exact: one-hot entries are 0/1).

Layout rule (the perf cliff this file exists to avoid): every DMA and
writeback must be CONTIGUOUS in HBM. Updates travel as
``[n_blocks, C_pad, B_ROWS]`` blocks, indices as ``[n_blocks', 128]``
rows, and the accumulator as ``[n_win, C_pad, W_CELLS]`` — a strided
``[C, M]`` layout makes each chunk DMA ~C separate strips and is
descriptor-bound (~100 us/chunk instead of ~2 us).

grad[v] = sum_{rows r with idx[r] == v} upd[r]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W_CELLS = 1024    # output cells per window (matmul granularity)
SUPER = 8         # windows per grid step (amortizes per-step fixed costs)
B_ROWS = 512      # update rows per DMA block
SUB = 128         # lane width; B_ROWS // SUB sub-blocks per DMA block


def _accum_kernel(C_PAD, bf16_rows, transposed, offs_ref, idx_hbm, updt_hbm,
                  out_ref, idx_scr, upd_scr, sems):
    w = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)

    def dma_pair(i, slot):
        return (
            pltpu.make_async_copy(
                idx_hbm.at[pl.ds(i * (B_ROWS // SUB), B_ROWS // SUB), :],
                idx_scr.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                updt_hbm.at[i], upd_scr.at[slot], sems.at[slot, 1]),
        )

    # SUPER windows per grid step: most per-step costs (output block DMA,
    # step dispatch) are fixed, and the extended grid is mostly empty under
    # occupancy pruning — at W_CELLS-sized steps those fixed costs dominated
    # the stage-1 grid gradient (~310 ms of a 550 ms step, PERF.md).
    for sw in range(SUPER):
        win = w * SUPER + sw
        start = offs_ref[win]
        end = offs_ref[win + 1]
        base = win * W_CELLS
        c0 = start // B_ROWS
        c1 = (end + B_ROWS - 1) // B_ROWS

        @pl.when(c0 < c1)
        def _():
            a, b = dma_pair(c0, 0)
            a.start()
            b.start()

        def chunk(i, _, start=start, end=end, base=base, c0=c0, c1=c1,
                  sw=sw):
            slot = jax.lax.rem(i - c0, 2)
            next_slot = jax.lax.rem(i - c0 + 1, 2)

            @pl.when(i + 1 < c1)
            def _():
                a, b = dma_pair(i + 1, next_slot)
                a.start()
                b.start()

            a, b = dma_pair(i, slot)
            a.wait()
            b.wait()
            r0 = i * B_ROWS
            for s in range(B_ROWS // SUB):
                r0s = r0 + s * SUB

                # skip sub-blocks with no rows in this window: the sorted
                # stream concentrates (avg ~M/n_win rows per 1024-cell
                # window at stage-1 scale), so ~3 of 4 sub-blocks of the
                # window's chunk are irrelevant — and the kernel is
                # MXU-bound on the one-hot matmuls, which otherwise run on
                # all-masked rows (measured: 26.6 -> ~7 ms at 162^3 x 96)
                @pl.when((r0s < end) & (r0s + SUB > start))
                def _(s=s, r0s=r0s):
                    rows = (r0s
                            + jax.lax.broadcasted_iota(jnp.int32, (SUB, 1),
                                                       0)[:, 0])
                    ok = (rows >= start) & (rows < end)
                    col = idx_scr[slot, s, :] - base
                    onehot = ((jax.lax.broadcasted_iota(jnp.int32,
                                                        (SUB, W_CELLS), 1)
                               == col[:, None]) & ok[:, None]
                              ).astype(jnp.bfloat16)
                    # Exact 0/1 matmul in 3 bf16 passes: the one-hot factor
                    # is exact in bf16, and the fp32 update splits exactly
                    # into hi+mid+lo bf16 terms (each residual subtraction
                    # is exact in fp32). Half the passes of
                    # Precision.HIGHEST, which 3-splits BOTH operands.
                    u = upd_scr[slot, :, s * SUB:(s + 1) * SUB]
                    if bf16_rows:
                        # lossy mode (APNERF_SCATTER_BF16): rows arrive
                        # already bf16-rounded — ONE matmul pass
                        # (accumulation stays fp32), half the update DMA
                        u_parts = (u,)
                    else:
                        u_hi = u.astype(jnp.bfloat16)
                        r1 = u - u_hi.astype(jnp.float32)
                        u_mid = r1.astype(jnp.bfloat16)
                        u_lo = (r1 - u_mid.astype(jnp.float32)).astype(
                            jnp.bfloat16)
                        u_parts = (u_hi, u_mid, u_lo)
                    if transposed:
                        # [C, W] accumulation: the wrapper exposes the
                        # accumulator as [8C, rows], so the corner reduce
                        # reads 8 CONTIGUOUS channel-block streams instead
                        # of 48-byte strided runs (R4 vs R0,
                        # scripts/profile_reduce.py: 6.3 vs 13.5 ms)
                        acc = jnp.zeros((C_PAD, W_CELLS), jnp.float32)
                        for u_part in u_parts:
                            acc = acc + jax.lax.dot_general(
                                u_part, onehot,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        out_ref[:, sw * W_CELLS:(sw + 1) * W_CELLS] += acc
                    else:
                        acc = jnp.zeros((W_CELLS, C_PAD), jnp.float32)
                        for u_part in u_parts:
                            acc = acc + jax.lax.dot_general(
                                onehot, u_part,
                                dimension_numbers=(((0,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        out_ref[0, sw * W_CELLS:(sw + 1) * W_CELLS, :] += acc
            return 0

        jax.lax.fori_loop(c0, c1, chunk, 0)


@functools.partial(jax.jit, static_argnames=("n_rows", "transposed"))
def sorted_window_accumulate(idx_sorted, upd_sorted, n_rows: int,
                             transposed: bool = False):
    """Accumulate ``upd_sorted [M, C]`` into ``out [n_rows, C]`` at row
    indices ``idx_sorted [M]`` (ascending, in [0, n_rows)).

    ``transposed=True`` returns ``out [C, n_rows]`` instead — written in
    that layout by the kernel (no XLA transpose), so a consumer slicing
    channel blocks (the 8-corner grid-gradient reduce, ops/grid.py) reads
    contiguous streams instead of 48-byte strided runs.

    APNERF_SCATTER_BF16=1 (default 0) streams the update rows bf16 and
    accumulates in ONE matmul pass instead of the exact 3-way split:
    half the update DMA bytes and a third of the one-hot MXU work, at
    bf16 rounding of each contribution (the accumulator stays fp32).
    Lossy — gate any production use on the pipeline PSNR tests.
    """
    import os
    bf16_rows = os.environ.get("APNERF_SCATTER_BF16", "0") == "1"
    M = idx_sorted.shape[0]
    C = upd_sorted.shape[1]
    C_PAD = max(16, ((C + 7) // 8) * 8)
    n_win = (n_rows + W_CELLS - 1) // W_CELLS
    n_sup = (n_win + SUPER - 1) // SUPER
    n_win_pad = n_sup * SUPER
    rows_pad = n_win_pad * W_CELLS

    mpad = (-M) % B_ROWS + B_ROWS
    n_blk = (M + mpad) // B_ROWS
    idx_p = jnp.concatenate(
        [idx_sorted.astype(jnp.int32),
         jnp.full((mpad,), rows_pad, jnp.int32)])
    # contiguous per-chunk update blocks: [n_blk, C_PAD, B_ROWS]
    u_dt = jnp.bfloat16 if bf16_rows else jnp.float32
    updt = jnp.zeros((M + mpad, C_PAD), u_dt)
    updt = updt.at[:M, :C].set(upd_sorted.astype(u_dt))
    updt = jnp.transpose(updt.reshape(n_blk, B_ROWS, C_PAD), (0, 2, 1))
    idx_blocks = idx_p.reshape(-1, SUB)

    bounds = jnp.arange(n_win_pad + 1, dtype=jnp.int32) * W_CELLS
    offsets = jnp.searchsorted(idx_p[:M], bounds, side="left").astype(jnp.int32)

    if transposed:
        out_spec = pl.BlockSpec((C_PAD, SUPER * W_CELLS),
                                lambda w, offs: (0, w),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C_PAD, rows_pad), jnp.float32)
    else:
        out_spec = pl.BlockSpec((1, SUPER * W_CELLS, C_PAD),
                                lambda w, offs: (w, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_sup, SUPER * W_CELLS, C_PAD),
                                         jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sup,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, B_ROWS // SUB, SUB), jnp.int32),
            pltpu.VMEM((2, C_PAD, B_ROWS), u_dt),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    from .knn_pallas import _interpret_mode
    out_t = pl.pallas_call(
        functools.partial(_accum_kernel, C_PAD, bf16_rows, transposed),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret_mode(),
    )(offsets, idx_blocks, updt)
    if transposed:
        # [C_PAD, rows_pad] -> [C, n_rows]
        return out_t[:C, :n_rows]
    # [n_sup, SUPER*W, C_PAD] -> [rows_pad, C_PAD] -> [n_rows, C]
    return out_t.reshape(rows_pad, C_PAD)[:n_rows, :C]


@functools.partial(jax.jit, static_argnames=("n_rows",))
def scatter_add_rows(idx, upd, n_rows: int):
    """Unsorted scatter-add of rows: argsort + sorted window accumulation.

    Drop-in replacement for ``zeros.at[idx].add(upd)`` when idx is 1-D and
    upd is [M, C<=16]. Falls back to the XLA scatter off-TPU."""
    from ..ops.knn import _tpu_default
    if not _tpu_default():
        return jnp.zeros((n_rows, upd.shape[1]), upd.dtype).at[idx].add(upd)
    order = jnp.argsort(idx)
    return sorted_window_accumulate(idx[order], upd[order], n_rows)
