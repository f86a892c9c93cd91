"""Voxel-grid trilinear interpolation, multi-scale sampling, resize, TV.

TPU-native replacements for the reference's ``F.grid_sample`` path
(lib/tineuvox.py:379-419), ``F.interpolate(trilinear, align_corners=True)``
grid rescale (lib/tineuvox.py:372) and the ``total_variation_add_grad`` CUDA
kernel (lib/cuda/total_variation_kernel.cu:13-67; here expressed as a loss so
XLA fuses its gradient into the step).

Grid layout: ``[X, Y, Z, C]`` (channels last — natural for TPU gathers and
for feeding the 128-lane MLPs downstream).
"""
from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp


def grid_interp(grid, xyz, xyz_min, xyz_max):
    """Trilinear sample of ``grid [X,Y,Z,C]`` at world points ``xyz [..., 3]``.

    Equivalent to torch ``F.grid_sample(align_corners=True,
    padding_mode='zeros')`` with coordinates normalised by the bbox
    (reference ``TiNeuVox.grid_sampler``, lib/tineuvox.py:379-394): world bbox
    min maps to index 0, bbox max maps to index ``size-1``; out-of-range
    corners contribute zero.
    """
    shape = jnp.asarray(grid.shape[:3], jnp.float32)
    u = (xyz - xyz_min) / (xyz_max - xyz_min) * (shape - 1.0)
    return _interp_at_indices(grid, u)


def _corner_tables(dims, i0, frac):
    """Per-corner (lin index, weight) tables, corner order k = dx*4+dy*2+dz."""
    sx, sy, sz = dims
    i1 = i0 + 1

    def inb(i, size):
        return (i >= 0) & (i < size)

    lins, ws = [], []
    for dx in (0, 1):
        ix = i1[:, 0] if dx else i0[:, 0]
        wx = frac[:, 0] if dx else 1.0 - frac[:, 0]
        for dy in (0, 1):
            iy = i1[:, 1] if dy else i0[:, 1]
            wy = frac[:, 1] if dy else 1.0 - frac[:, 1]
            for dz in (0, 1):
                iz = i1[:, 2] if dz else i0[:, 2]
                wz = frac[:, 2] if dz else 1.0 - frac[:, 2]
                ok = (inb(ix, sx) & inb(iy, sy) & inb(iz, sz)).astype(
                    jnp.float32)
                lin = (jnp.clip(ix, 0, sx - 1) * sy
                       + jnp.clip(iy, 0, sy - 1)) * sz + jnp.clip(iz, 0, sz - 1)
                lins.append(lin)
                ws.append(wx * wy * wz * ok)
    return jnp.stack(lins, 1), jnp.stack(ws, 1)


def _pack8_gather(dims, grid_flat, lin_ext):
    """Gather all 8 trilinear corners of each sample with ONE row gather.

    Builds a neighbourhood table over the EXTENDED grid, ``P [(sx+1)*
    (sy+1)*(sz+1), 8*C] bf16``: row b = the 2x2x2 corner block of base
    cell b-1 (per axis), i.e. exactly the corners ``_corner_tables``
    addresses for a sample whose extended base cell is b — including the
    one-cell-out-of-range cases, where the zero padding reproduces the
    ``padding_mode='zeros'`` semantics. ``lin_ext`` (clip(i0+1)) is
    already that base cell, so one 8C-channel bf16 row per sample
    replaces eight C-channel fp32 gathers: the TPU gather cost is
    dominated by row COUNT (PERF.md gather-floor playbook). The bf16
    cast quantises the interpolated features — the consuming MLPs
    already run bf16 activations (TiNeuVoxConfig.mlp_bf16); d/dgrid
    stays fp32 (the backward scatter uses the fp32 weights and
    cotangents, not these values).
    """
    sx, sy, sz = dims
    C = grid_flat.shape[-1]
    g = grid_flat.reshape(sx, sy, sz, C).astype(jnp.bfloat16)
    gp = jnp.pad(g, ((1, 1), (1, 1), (1, 1), (0, 0)))
    ex, ey, ez = sx + 1, sy + 1, sz + 1
    P = jnp.concatenate(
        [gp[dx:dx + ex, dy:dy + ey, dz:dz + ez]
         for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        axis=-1).reshape(ex * ey * ez, 8 * C)
    # KNOWN libtpu HAZARD: inside large *training* programs this path
    # kills the TPU worker at some grid shapes — first seen at
    # (140,140,104)x12, the num_voxels/2 pg_scale segment of the 400x400
    # train-clock (the round-4 "non-pow2 budget" diagnosis was this same
    # fault; the budget change merely reshuffled the compile). Bisect
    # evidence (scripts/repro_pg1600.py, on-chip 2026-08-20): the same
    # shapes are green in small programs (scale_volume_grid, occupancy)
    # and green with APNERF_PACK8=0; an optimization_barrier fence after
    # P does NOT dodge it, so it is not the pad+slice+concat fusion.
    # The swept/benched 160^3 family is green. Mitigation: training runs
    # whose pg_scale schedule crosses unswept shapes set APNERF_PACK8=0
    # (scripts/train_clock.py does); render/bench paths are unaffected.
    vals8 = P[lin_ext]                                 # [M, 8C] bf16
    return vals8.reshape(-1, 8, C).astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _corner_gather(dims, grid_flat, w, lin, lin_ext):
    """sum_k grid_flat[lin[:, k]] * w[:, k, None] -> [M, C].

    Custom VJP for d/dgrid only (d/dw is the cheap per-corner dot and flows
    back to the sample positions via plain autodiff of the weight tables).
    The grid gradient avoids both the XLA scatter floor and the 8x corner
    argsort — contributions are binned by *base cell* with ONE sort of M
    keys (``lin_ext``, valid because every corner index is base + a
    constant offset), accumulated into an extended [sx+1, sy+1, sz+1]
    buffer holding all 8 corner channels by the Pallas sorted-window kernel,
    then reduced by 8 dense shifted slices. Replaces the ``F.grid_sample``
    backward of the reference (lib/tineuvox.py:379-419).
    """
    out = 0.0
    for k in range(lin.shape[1]):
        out = out + grid_flat[lin[:, k]] * w[:, k, None]
    return out


def _corner_gather_fwd(dims, grid_flat, w, lin, lin_ext):
    # save the gathered corner values: re-gathering them in the backward
    # costs another 8*M random rows at the TPU gather floor (~0.15 s/step
    # at stage-1 scale); the [M, 8, C] residual trades ~600 MB of HBM for it
    from .knn import _tpu_default
    import os
    if _tpu_default() and os.environ.get("APNERF_PACK8", "1") == "1":
        vals = _pack8_gather(dims, grid_flat, lin_ext)
    else:
        vals = jnp.stack([grid_flat[lin[:, k]] for k in range(8)], axis=1)
    out = (vals * w[:, :, None]).sum(1)
    return out, (vals, w, lin, lin_ext)


def _corner_gather_bwd(dims, res, g):
    vals, w, lin, lin_ext = res
    sx, sy, sz = dims
    C = vals.shape[-1]
    M = w.shape[0]

    # d/dw: per-corner inner products (from saved values, no gather)
    dw = (vals * g[:, None, :]).sum(-1)

    # d/dgrid: base-cell binned accumulation
    upd = (g[:, None, :] * w[:, :, None]).reshape(M, 8 * C)
    from .knn import _tpu_default
    if _tpu_default() and os.environ.get("APNERF_SCATTER", "1") == "1":
        from ..kernels.scatter_pallas import sorted_window_accumulate
        ex, ey, ez = sx + 1, sy + 1, sz + 1
        order = jnp.argsort(lin_ext)
        idx_sorted = lin_ext[order]

        def accum_chunk(upd_c, Cc):
            """One extended-grid accumulation + 8-corner reduce for a chunk
            of Cc channels (bounds the [8*Cc, ex*ey*ez] buffer — at 36
            channels a single pass would need ~5 GB)."""
            # TRANSPOSED accumulator [8*Cc, n_cells]: each packed corner's
            # channel block is a contiguous stream, so the shifted-slice
            # reduce below reads full-bandwidth runs instead of 48-byte
            # strided runs (measured 6.3 vs 13.5 ms at 162^3 x 96,
            # scripts/profile_reduce.py R4 vs R0).
            acc = sorted_window_accumulate(idx_sorted, upd_c,
                                           ex * ey * ez, transposed=True)
            # Reduce the 8 packed corner copies onto their cells with FLAT
            # column-shifted slices: dgrid[c, p] = sum_k acc[k*Cc + c,
            # p + off_k] with off_k = ((1-dx)*ey + (1-dy))*ez + (1-dz).
            # Valid because every read index decomposes in-range per axis
            # (x+1-dx in [0, ex) etc.), so flat offsets never wrap — one
            # fused pass reading each acc element exactly once.
            acc = jax.lax.optimization_barrier(acc)
            n_cells = ex * ey * ez
            maxoff = (ey + 1) * ez + 1
            accp = jnp.concatenate(
                [acc, jnp.zeros((8 * Cc, maxoff), jnp.float32)], 1)
            red = 0.0
            for dx_ in (0, 1):
                for dy_ in (0, 1):
                    for dz_ in (0, 1):
                        k = (dx_ * 2 + dy_) * 2 + dz_
                        off = ((1 - dx_) * ey + (1 - dy_)) * ez + (1 - dz_)
                        red = red + jax.lax.dynamic_slice(
                            accp, (k * Cc, off), (Cc, n_cells))
            return red.reshape(Cc, ex, ey, ez)[:, :sx, :sy, :sz
                                               ].transpose(1, 2, 3, 0
                                                           ).reshape(-1, Cc)

        CG = min(C, 12)                # channel chunk (memory bound)
        if C % CG:
            CG = C                     # odd widths: single pass
        if CG == C:
            dgrid = accum_chunk(upd[order], C)
        else:
            upd8 = upd.reshape(M, 8, C)[order]
            parts = []
            for c0 in range(0, C, CG):
                upd_c = upd8[:, :, c0:c0 + CG].reshape(M, 8 * CG)
                parts.append(accum_chunk(upd_c, CG))
            dgrid = jnp.concatenate(parts, -1)
    else:
        # grid_flat is always cast to float32 by _interp_at_indices
        dgrid = jnp.zeros((sx * sy * sz, C), jnp.float32).at[
            lin.T.reshape(-1)].add(
            upd.reshape(M, 8, C).transpose(1, 0, 2).reshape(-1, C))
    return dgrid, dw, None, None


_corner_gather.defvjp(_corner_gather_fwd, _corner_gather_bwd)


def _interp_at_indices(grid, u):
    """Trilinear interp at fractional voxel indices ``u [..., 3]``."""
    sx, sy, sz = grid.shape[:3]
    lead = u.shape[:-1]
    u = u.reshape(-1, 3)
    i0f = jnp.floor(u)
    i0 = i0f.astype(jnp.int32)
    lins, ws = _corner_tables((sx, sy, sz), i0, u - i0f)
    # extended-grid base cell (all-clipped rows carry w == 0)
    ey, ez = sy + 1, sz + 1
    bx = jnp.clip(i0[:, 0] + 1, 0, sx)
    by = jnp.clip(i0[:, 1] + 1, 0, sy)
    bz = jnp.clip(i0[:, 2] + 1, 0, sz)
    lin_ext = (bx * ey + by) * ez + bz
    out = _corner_gather(
        (sx, sy, sz), grid.reshape(-1, grid.shape[-1]).astype(jnp.float32),
        ws, jax.lax.stop_gradient(lins), jax.lax.stop_gradient(lin_ext))
    return out.reshape(*lead, grid.shape[-1])


def pad_to_mult4(grid):
    """Zero-pad each spatial dim to ``ceil((n-1)/4)*4 + 1`` on the high side
    (reference ``mult_dist_interp`` padding, lib/tineuvox.py:404-407)."""
    pads = []
    for d in range(3):
        n = grid.shape[d]
        pads.append(int(math.ceil((n - 1) / 4.0) * 4 - n + 1))
    return jnp.pad(grid, ((0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)))


def _upsample_axis_2x(g, axis, reps):
    """Exact align-corners linear upsample by 2^reps along one axis.

    Sizes are 2^r*k+1 -> ... -> 2k+1 -> n (odd chain from pad_to_mult4), so
    each doubling interleaves the source values with midpoints — the
    upsampled values are EXACTLY the linear interpolation of the coarse
    grid at the fine corners (midpoint weight 0.5 is exact in fp32).
    """
    for _ in range(reps):
        n = g.shape[axis]
        a = jax.lax.slice_in_dim(g, 0, n - 1, axis=axis)
        b = jax.lax.slice_in_dim(g, 1, n, axis=axis)
        mid = 0.5 * (a + b)
        stacked = jnp.stack([a, mid], axis=axis + 1)
        sh = list(g.shape)
        sh[axis] = 2 * (n - 1)
        interleaved = stacked.reshape(sh)
        g = jnp.concatenate(
            [interleaved, jax.lax.slice_in_dim(g, n - 1, n, axis=axis)],
            axis=axis)
    return g


def bake_multiscale(grid):
    """Bake the stride-1/2/4 multiscale features into ONE fine grid
    ``[X', Y', Z', 3C]`` (padded 4k+1 dims).

    Sampling the baked grid with one trilinear interp is EXACTLY
    ``mult_dist_interp``: the coarse scales are piecewise-trilinear on
    coarse cells, every fine cell nests inside one coarse cell (stride-2/4
    subdivision with shared corners), and trilinear interpolation of the
    exact fine-corner samples reproduces a trilinear function. This turns
    24 gather rows per sample (8 corners x 3 scales of C-channel rows)
    into 8 rows of 3C channels — the TPU gather floor is per ROW
    (PERF.md), so the hot stage-1 interp runs ~3x fewer gathers, and the
    grid gradient needs ONE base-cell sort instead of three.

    Deviation: for points OUTSIDE the bbox (deformation can push samples
    out), zero-padding applies the fine grid's partial corner weights to
    all scales, whereas the reference applies each scale's own partial
    weights (lib/tineuvox.py:386 padding_mode='zeros' per scale). Inside
    the bbox the result is bit-for-bit the per-scale computation.
    """
    g = pad_to_mult4(grid.astype(jnp.float32))
    g_m = g[::2, ::2, ::2]
    g_s = g[::4, ::4, ::4]
    up_m = g_m
    up_s = g_s
    for ax in range(3):
        up_m = _upsample_axis_2x(up_m, ax, 1)
        up_s = _upsample_axis_2x(up_s, ax, 2)
    return jnp.concatenate([g, up_m, up_s], axis=-1)


def mult_dist_interp(grid, xyz, xyz_min, xyz_max, baked=None):
    """Multi-scale (stride 1/2/4) trilinear features, concatenated on channels.

    Mirrors reference ``TiNeuVox.mult_dist_interp`` (lib/tineuvox.py:402-419):
    the grid is zero-padded to a 4k+1 size; all three scales are sampled with
    the SAME bbox-normalised coordinate, i.e. normalised coord 1 maps to index
    ``padded_size-1`` of each (strided) grid.

    On TPU the three scales are baked into one 3C-channel fine grid
    (``bake_multiscale`` — numerically equivalent, 3x fewer gather rows);
    pass ``baked`` to reuse a precomputed bake. The channel order of the
    output matches the reference: [fine C | stride-2 C | stride-4 C].
    """
    from .knn import _tpu_default
    import os
    # APNERF_BAKE=1 samples a baked 3C grid instead of three per-scale
    # interps (3x fewer gather rows). Default OFF: measured 963 ms vs
    # 590 ms per stage-1 step at 160^3 — the row-count win is outweighed
    # elsewhere (see scripts/bench_interp.py A/B); kept for exactness
    # tests and future diagnosis.
    if (baked is None and _tpu_default()
            and os.environ.get("APNERF_BAKE", "0") == "1"):
        baked = bake_multiscale(grid)
    if baked is not None:
        shape_l = jnp.asarray(baked.shape[:3], jnp.float32)
        unit = (xyz - xyz_min) / (xyz_max - xyz_min)
        return _interp_at_indices(baked, unit * (shape_l - 1.0))
    g = pad_to_mult4(grid.astype(jnp.float32))
    shape_l = jnp.asarray(g.shape[:3], jnp.float32)
    unit = (xyz - xyz_min) / (xyz_max - xyz_min)
    vox_l = _interp_at_indices(g, unit * (shape_l - 1.0))
    g_m = g[::2, ::2, ::2]
    vox_m = _interp_at_indices(g_m, unit * (jnp.asarray(g_m.shape[:3], jnp.float32) - 1.0))
    g_s = g[::4, ::4, ::4]
    vox_s = _interp_at_indices(g_s, unit * (jnp.asarray(g_s.shape[:3], jnp.float32) - 1.0))
    return jnp.concatenate([vox_l, vox_m, vox_s], axis=-1)


def resize_trilinear(grid, new_shape):
    """align_corners=True trilinear resize of ``grid [X,Y,Z,C]``.

    Matches ``F.interpolate(..., mode='trilinear', align_corners=True)`` used
    by progressive grid upscaling (reference lib/tineuvox.py:372).
    """
    axes_u = []
    for d, (src, dst) in enumerate(zip(grid.shape[:3], new_shape)):
        if dst == 1:
            axes_u.append(jnp.zeros((1,), jnp.float32))
        else:
            axes_u.append(jnp.arange(dst, dtype=jnp.float32) * (src - 1) / (dst - 1))
    u = jnp.stack(jnp.meshgrid(*axes_u, indexing="ij"), axis=-1)
    return _interp_at_indices(grid, u)


def total_variation_grad(grid, weight, mask=None):
    """Analytic clamped-6-neighbour TV gradient, reference-exact.

    Mirrors ``total_variation_add_grad`` (total_variation_kernel.cu:13-67):
    g_i = (weight/6) * sum_n clamp(v_i - v_n, -1, 1) over the up-to-6 axis
    neighbours (boundary terms zero). ``mask`` [X,Y,Z] implements the CUDA
    ``dense_mode=False`` branch: voxels with mask False receive NO gradient
    (their neighbours still do — the skip is one-sided, which a masked loss
    term cannot express; that is why this is a gradient, not a loss).
    """
    g = 0.0
    for axis in range(3):
        for direction in (1, -1):
            sl = [slice(None)] * 4
            edge = [slice(None)] * 4
            if direction > 0:
                sl[axis] = slice(0, -1)
                edge[axis] = slice(0, 1)
                shifted = jnp.concatenate(
                    [grid[tuple(edge)], grid[tuple(sl)]], axis)
            else:
                sl[axis] = slice(1, None)
                edge[axis] = slice(-1, None)
                shifted = jnp.concatenate(
                    [grid[tuple(sl)], grid[tuple(edge)]], axis)
            g = g + jnp.clip(grid - shifted, -1.0, 1.0)
    g = (weight / 6.0) * g
    if mask is not None:
        g = jnp.where(mask[..., None], g, 0.0)
    return g


def total_variation(grid, mask=None):
    """Mean clamped-6-neighbour TV of the grid, expressed as a loss.

    The reference adds the TV *gradient* directly into ``feature.grad``
    (total_variation_kernel.cu:13-67): grad_i += weight * sum_n clamp(v_i -
    v_n, -1, 1) over the 6 neighbours, i.e. the gradient of
    ``sum Huber-like |v_i - v_n|`` with slope clamped to 1. We use the exact
    potential whose gradient is that clamped difference:
    ``phi(d) = 0.5*d^2`` for |d|<=1 else ``|d| - 0.5``, summed over the three
    forward differences (each edge contributes to both endpoints in the CUDA
    version; the potential counts each edge once, its autodiff gradient then
    touches both endpoints exactly like the kernel).

    ``mask`` (sparse mode): only edges where at least one endpoint is active
    contribute, approximating the CUDA ``dense_mode=False`` grad!=0 skip.
    Returns the SUM of edge potentials divided by the number of voxels, so the
    caller's ``weight * world_size.max()/128`` scaling (lib/tineuvox.py:374-377)
    carries over.
    """
    def phi(d):
        ad = jnp.abs(d)
        return jnp.where(ad <= 1.0, 0.5 * d * d, ad - 0.5)

    total = 0.0
    n = grid.shape[0] * grid.shape[1] * grid.shape[2]
    for axis in range(3):
        d = jnp.diff(grid, axis=axis)
        p = phi(d)
        if mask is not None:
            sl_a = [slice(None)] * 3
            sl_b = [slice(None)] * 3
            sl_a[axis] = slice(None, -1)
            sl_b[axis] = slice(1, None)
            m = mask[tuple(sl_a)] | mask[tuple(sl_b)]
            p = jnp.where(m[..., None], p, 0.0)
        total = total + p.sum()
    return total / n
