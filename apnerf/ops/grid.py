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
    """Per-corner (lin index, weight, per-axis weight partials) tables.

    Corner order k = dx*4 + dy*2 + dz. ``wp[a]`` is dw/dfrac_a (the signed
    product of the other two axes' weights, zeroed out of bounds).
    """
    sx, sy, sz = dims
    i1 = i0 + 1

    def inb(i, size):
        return (i >= 0) & (i < size)

    lins, ws, wpx, wpy, wpz = [], [], [], [], []
    for dx in (0, 1):
        ix = i1[:, 0] if dx else i0[:, 0]
        wx = frac[:, 0] if dx else 1.0 - frac[:, 0]
        gx = 1.0 if dx else -1.0
        for dy in (0, 1):
            iy = i1[:, 1] if dy else i0[:, 1]
            wy = frac[:, 1] if dy else 1.0 - frac[:, 1]
            gy = 1.0 if dy else -1.0
            for dz in (0, 1):
                iz = i1[:, 2] if dz else i0[:, 2]
                wz = frac[:, 2] if dz else 1.0 - frac[:, 2]
                gz = 1.0 if dz else -1.0
                ok = (inb(ix, sx) & inb(iy, sy) & inb(iz, sz)).astype(
                    jnp.float32)
                lin = (jnp.clip(ix, 0, sx - 1) * sy
                       + jnp.clip(iy, 0, sy - 1)) * sz + jnp.clip(iz, 0, sz - 1)
                lins.append(lin)
                ws.append(wx * wy * wz * ok)
                wpx.append(gx * wy * wz * ok)
                wpy.append(wx * gy * wz * ok)
                wpz.append(wx * wy * gz * ok)
    return (jnp.stack(lins, 1), jnp.stack(ws, 1),
            (jnp.stack(wpx, 1), jnp.stack(wpy, 1), jnp.stack(wpz, 1)))


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _trilerp(dims, grid_flat, u):
    """Fused trilinear interp: out[m] = sum_k grid_flat[lin_k(u_m)] w_k(u_m).

    Custom VJP: d/dgrid avoids both the XLA scatter floor and the 8x corner
    argsort — contributions are binned by *base cell* with ONE sort of M keys
    (valid because every corner index is base + a constant offset), windowed
    into an extended [sx+1, sy+1, sz+1] accumulator holding all 8 corner
    channels, then reduced by 8 dense shifted slices. Replaces the
    ``F.grid_sample`` backward of the reference (lib/tineuvox.py:379-419).
    """
    lins, ws, _ = _corner_tables(dims, jnp.floor(u).astype(jnp.int32),
                                 u - jnp.floor(u))
    out = 0.0
    for k in range(8):
        out = out + grid_flat[lins[:, k]] * ws[:, k, None]
    return out


def _trilerp_fwd(dims, grid_flat, u):
    return _trilerp(dims, grid_flat, u), (grid_flat, u)


def _trilerp_bwd(dims, res, g):
    grid_flat, u = res
    sx, sy, sz = dims
    C = grid_flat.shape[1]
    M = u.shape[0]
    i0 = jnp.floor(u).astype(jnp.int32)
    lins, ws, wps = _corner_tables(dims, i0, u - i0)

    # d/du: sum_k dw_k/dfrac_a * (grid[lin_k] . g)  (frac grad == u grad)
    dots = jnp.stack([(grid_flat[lins[:, k]] * g).sum(-1) for k in range(8)],
                     axis=1)                                     # [M, 8]
    du = jnp.stack([(wp * dots).sum(1) for wp in wps], axis=1)   # [M, 3]

    # d/dgrid: base-cell binned accumulation
    upd = (g[:, None, :] * ws[:, :, None]).reshape(M, 8 * C)
    from .knn import _tpu_default
    if _tpu_default():
        from ..kernels.scatter_pallas import sorted_window_accumulate
        ex, ey, ez = sx + 1, sy + 1, sz + 1
        bx = jnp.clip(i0[:, 0] + 1, 0, sx)   # all-clipped rows have w == 0
        by = jnp.clip(i0[:, 1] + 1, 0, sy)
        bz = jnp.clip(i0[:, 2] + 1, 0, sz)
        lin_ext = (bx * ey + by) * ez + bz
        order = jnp.argsort(lin_ext)
        acc = sorted_window_accumulate(lin_ext[order], upd[order],
                                       ex * ey * ez)
        acc = acc.reshape(ex, ey, ez, 8, C)
        dgrid = 0.0
        for k, (dx, dy, dz) in enumerate(
                [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]):
            dgrid = dgrid + jax.lax.slice(
                acc, (1 - dx, 1 - dy, 1 - dz, k, 0),
                (1 - dx + sx, 1 - dy + sy, 1 - dz + sz, k + 1, C))[..., 0, :]
        dgrid = dgrid.reshape(-1, C)
    else:
        dgrid = jnp.zeros_like(grid_flat).at[lins.T.reshape(-1)].add(
            upd.reshape(M, 8, C).transpose(1, 0, 2).reshape(-1, C))
    return dgrid.astype(grid_flat.dtype), du


_trilerp.defvjp(_trilerp_fwd, _trilerp_bwd)


def _interp_at_indices(grid, u):
    """Trilinear interp at fractional voxel indices ``u [..., 3]``."""
    lead = u.shape[:-1]
    out = _trilerp(grid.shape[:3], grid.reshape(-1, grid.shape[-1]).astype(
        jnp.float32), u.reshape(-1, 3))
    return out.reshape(*lead, grid.shape[-1])


def pad_to_mult4(grid):
    """Zero-pad each spatial dim to ``ceil((n-1)/4)*4 + 1`` on the high side
    (reference ``mult_dist_interp`` padding, lib/tineuvox.py:404-407)."""
    pads = []
    for d in range(3):
        n = grid.shape[d]
        pads.append(int(math.ceil((n - 1) / 4.0) * 4 - n + 1))
    return jnp.pad(grid, ((0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)))


def mult_dist_interp(grid, xyz, xyz_min, xyz_max):
    """Multi-scale (stride 1/2/4) trilinear features, concatenated on channels.

    Mirrors reference ``TiNeuVox.mult_dist_interp`` (lib/tineuvox.py:402-419):
    the grid is zero-padded to a 4k+1 size; all three scales are sampled with
    the SAME bbox-normalised coordinate, i.e. normalised coord 1 maps to index
    ``padded_size-1`` of each (strided) grid.
    """
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
